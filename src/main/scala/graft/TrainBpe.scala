package graft

import org.apache.spark.sql.SparkSession

/** One-shot trainer for the committed BPE merges fixture
  * ([[graft.functions.BpeFixture]]): prints the learned merges table as
  * both Scala source and DuckDB `VALUES` rows, so the fixture and the
  * q_bpe oracle stay regenerable from the corpus with one command:
  *
  * `sbt "runMain graft.TrainBpe /root/testdata/sf0.01 40"`
  */
object TrainBpe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val numMerges = args.lift(1).map(_.toInt).getOrElse(40)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val merges = graft.functions.Bpe.trainOnCorpus(
      Tables.documents(spark, sfDir), "text", numMerges)
    def q(s: String): String = s.replace("\\", "\\\\").replace("\"", "\\\"")
    println("// ---- Scala fixture ----")
    merges.foreach { case (a, b) => println(s"""    ("${q(a)}", "${q(b)}"),""") }
    println("// ---- DuckDB VALUES (rank, a, b) ----")
    def sq(s: String): String = s.replace("'", "''")
    println(merges.zipWithIndex
      .map { case ((a, b), i) => s"($i,'${sq(a)}','${sq(b)}')" }
      .mkString(",\n"))
    spark.stop()
  }
}
