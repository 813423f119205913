package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: times every declared query at the given SF and
  * prints one JSON line. Each query is fully materialized via a noop-format
  * write (count() would let Catalyst prune computed columns and understate
  * the work).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      // test tables are single ~20 MB parquet files; the default 128 MB
      // split would scan each on one core
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.sql.codegen.wholeStage", sys.env.getOrElse("SPARK_GRAFT_CODEGEN", "true"))
      .config("spark.sql.parquet.filterPushdown", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed warm-up: JVM/codegen/parquet-footer caches, same as any
    // long-running cluster where these costs amortize to zero.
    SparkEntry.queries.get("q1_agg").foreach(_(spark, sfDir).count())
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
      }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + f"""\":$v%.3f""" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
