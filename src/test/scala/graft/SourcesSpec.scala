package graft

import org.apache.spark.sql.functions._

/** Source-format round trips (graft.queries.SourceQueries): CSV, JSON-lines,
  * and ORC writes read back losslessly, and the ORC reader receives the
  * pushed predicate (stride-stats row-group skipping — the same scan-prune
  * posture the parquet gates assert).
  */
class SourcesSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(prefix: String) =
    java.nio.file.Files.createTempDirectory(prefix)

  private def rm(base: java.nio.file.Path): Unit = {
    import scala.jdk.CollectionConverters._
    if (java.nio.file.Files.exists(base))
      java.nio.file.Files.walk(base).iterator().asScala.toSeq
        .reverse.foreach(java.nio.file.Files.delete)
  }

  test("csv round trip is lossless with an explicit schema") {
    val base = tmpDir("graft_csv_spec_")
    try {
      val df = Seq((1L, "HIGH", 12345L), (2L, "LOW", -7L), (3L, "HIGH", 0L))
        .toDF("k", "pri", "cents")
      df.write.option("header", "true").csv(base.resolve("o").toString)
      val back = spark.read.schema("k LONG, pri STRING, cents LONG")
        .option("header", "true").csv(base.resolve("o").toString)
      assert(back.orderBy($"k").collect().toSeq ===
        df.orderBy($"k").collect().toSeq)
    } finally rm(base)
  }

  test("json-lines round trip is lossless with an explicit schema") {
    val base = tmpDir("graft_json_spec_")
    try {
      val df = Seq((1L, "a b \"quoted\" c", 9L), (2L, "unicode é中", -1L))
        .toDF("k", "t", "v")
      df.write.json(base.resolve("o").toString)
      val back = spark.read.schema("k LONG, t STRING, v LONG")
        .json(base.resolve("o").toString)
      assert(back.orderBy($"k").collect().toSeq ===
        df.orderBy($"k").collect().toSeq)
    } finally rm(base)
  }

  test("orc round trip is lossless and the filter is pushed to the scan") {
    val base = tmpDir("graft_orc_spec_")
    try {
      val df = (0L until 1000L).map(i => (i, i.toDouble % 50, s"r$i"))
        .toDF("k", "qty", "s")
      df.write.orc(base.resolve("o").toString)
      val back = spark.read.schema("k LONG, qty DOUBLE, s STRING")
        .orc(base.resolve("o").toString)
        .filter($"qty" >= 30.0)
      // the predicate must reach the ORC scan node, not sit in a Filter
      // above an unpruned scan
      val scanDesc = back.queryExecution.executedPlan.toString
      assert(scanDesc.contains("PushedFilters: [IsNotNull(qty), " +
        "GreaterThanOrEqual(qty,30.0)]"),
        s"expected qty predicate pushed to the ORC scan, plan:\n$scanDesc")
      assert(back.count() === df.filter($"qty" >= 30.0).count())
    } finally rm(base)
  }

  test("bz2 text round trip: extension-inferred decompression, .bz2 files") {
    val base = tmpDir("graft_bz2_spec_")
    try {
      val lines = (1 to 200).map(i => s"row$i|payload$i")
      lines.toDF("value").write.option("compression", "bzip2")
        .text(base.resolve("o").toString)
      // the codec must actually be bzip2 on disk, not silently plain text
      val parts = base.resolve("o").toFile.listFiles
        .filter(_.getName.startsWith("part-"))
      assert(parts.nonEmpty && parts.forall(_.getName.endsWith(".bz2")),
        s"expected .bz2 part files, got ${parts.map(_.getName).toSeq}")
      val back = spark.read
        .textFile(base.resolve("o").toString + "/part-*.bz2")
      assert(back.collect().sorted.toSeq === lines.sorted)
    } finally rm(base)
  }

  test("explicit file:// scheme glob reads through the Hadoop FS registry") {
    val base = tmpDir("graft_uri_spec_")
    try {
      val lines = (1 to 50).map(i => s"u$i")
      lines.toDF("value").write.text(base.resolve("o").toString)
      val uri = "file://" + base.resolve("o").toAbsolutePath + "/part-*"
      assert(spark.read.textFile(uri).collect().sorted.toSeq === lines.sorted)
    } finally rm(base)
  }
}
