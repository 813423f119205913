package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.SpanIndex
import graft.queries.FacadeQueries

/** TEMPORARY r16 profiling main: replays q_span_index_append_bucketed
  * phase by phase with per-phase wall timing, so the event-log stages can
  * be attributed. Deleted before end of round.
  */
object ProfileSpan {
  private def t[A](spark: SparkSession, name: String)(f: => A): A = {
    spark.sparkContext.setJobDescription(name)
    val t0 = System.nanoTime()
    val r = f
    println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
    spark.sparkContext.setJobDescription(null)
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "1m")
      .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.eventLog.enabled",
        sys.env.getOrElse("PROFILE_EVLOG", "false"))
      .config("spark.eventLog.dir", "/tmp/evlog")
      .config("spark.eventLog.compress", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    // warm-up, as Bench does
    SparkEntry.queries("q1_agg")(spark, sfDir).count()
    val reps = sys.env.getOrElse("PROFILE_REPS", "2").toInt
    for (rep <- 1 to reps) {
      println(s"=== rep $rep ===")
      val t0 = System.nanoTime()
      val fx = Tables.documents(spark, sfDir).select($"doc_id", concat(
        when($"doc_id" % 7 === 0,
          lit("license block alpha beta gamma delta epsilon zeta eta " +
            "theta iota kappa lambda mu nu xi omicron rho sigma tau upsilon "))
          .otherwise(lit("")),
        $"text",
        when($"doc_id" % 5 === 0, lit(" quote aa bb cc dd ee ff gg"))
          .otherwise(lit("")),
        when($"doc_id" % 11 === 0, concat(
          lit(" rep"), $"doc_id".cast("string"),
          lit(" s1 s2 s3 s4 s5 s6 s7 rep"), $"doc_id".cast("string"),
          lit(" s1 s2 s3 s4 s5 s6 s7"))).otherwise(lit(""))
      ).as("text"))
      val old = fx.filter($"doc_id" % 10 >= 2)
      val b1 = fx.filter($"doc_id" % 10 === 0)
      val b2 = fx.filter($"doc_id" % 10 === 1)
      val base = java.nio.file.Files.createTempDirectory("graft_prof_")
      val cenPath = base.resolve("cen").toString
      val (idx0, cen0) = t(spark, "build80") {
        val r = SpanIndex.buildDuplicateSpanIndexWithCensus(old,
          "doc_id", "text", floor = 8, cap = 24)
        r._1.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        r._1.write.format("noop").mode("overwrite").save()
        r
      }
      t(spark, "writeCensus") {
        SpanIndex.writeSpanCensus(cen0, cenPath, buckets = 16)
      }
      val cen = t(spark, "readCensus") {
        SpanIndex.readSpanCensus(spark, cenPath)
      }
      val idx1 = t(spark, "append1") {
        val (i, _) = SpanIndex.appendToSpanIndexWithCensus(idx0, cen,
          old, b1, "doc_id", "text", floor = 8, cap = 24,
          rebuildFraction = 10.0)
        i.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        i.write.format("noop").mode("overwrite").save()
        i
      }
      val cen1 = t(spark, "storeAppend") {
        SpanIndex.appendSpanCensusStore(spark, cenPath, b1,
          "doc_id", "text", floor = 8)
      }
      val idx = t(spark, "append2") {
        val (i, _) = SpanIndex.appendToSpanIndexWithCensus(idx1, cen1,
          old.unionByName(b1), b2, "doc_id", "text", floor = 8, cap = 24,
          rebuildFraction = 10.0)
        i.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        i.write.format("noop").mode("overwrite").save()
        i
      }
      t(spark, "serve") {
        val out = Seq(8, 16).map { l =>
            SpanIndex.spanIntervalsFromIndex(idx, fx, "doc_id", "text", l)
              .withColumn("min_len", lit(l))
          }.reduce(_ unionByName _)
            .orderBy($"min_len", $"doc_id", $"span_start")
        out.write.format("noop").mode("overwrite").save()
      }
      println(f"[profile] TOTAL ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      graft.operators.Release.datasetAfterConsumingAction(idx)
      graft.operators.Release.datasetAfterConsumingAction(idx1)
      graft.operators.Release.datasetAfterConsumingAction(idx0)
      FacadeQueries.deleteRecursively(base)
      spark.sparkContext.getPersistentRDDs.values.foreach { r =>
        try r.unpersist(blocking = true)
        catch { case _: org.apache.spark.SparkException => }
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
