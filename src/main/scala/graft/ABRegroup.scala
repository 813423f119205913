package graft

import org.apache.spark.sql.SparkSession

/** TEMPORARY r16 A/B harness: alternate the regroupPairs exchange shape
  * (graft.regroupSingleExchange on/off) on selected gates within ONE JVM,
  * so host-level drift cancels. Deleted before end of round.
  * Args: <reps> <comma-separated gates>.
  */
object ABRegroup {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.flatMap(_.toIntOption).getOrElse(3)
    val gates = if (args.length > 1) args(1).split(",").toSeq
      else Seq("q_span_index_multi", "q_span_index_append_census")
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
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.queries("q1_agg")(spark, sfDir).count() // warm-up
    val results = scala.collection.mutable.Map[(String, String),
      List[Double]]().withDefaultValue(Nil)
    val order = if (sys.env.get("AB_REVERSE").contains("1")) Seq("false", "true") else Seq("true", "false")
    for (rep <- 1 to reps; arm <- order; g <- gates) {
      spark.conf.set("graft.regroupSingleExchange", arm)
      val t0 = System.nanoTime()
      SparkEntry.queries(g)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      results((g, arm)) = dt :: results((g, arm))
      println(f"[ab] rep$rep arm=$arm%-5s $g%-34s $dt%7.2f s")
      spark.sparkContext.getPersistentRDDs.values.foreach { r =>
        try r.unpersist(blocking = true)
        catch { case _: org.apache.spark.SparkException => }
      }
      spark.catalog.clearCache()
    }
    def med(xs: List[Double]) = xs.sorted.apply(xs.length / 2)
    for (g <- gates; arm <- Seq("true", "false"))
      println(f"[ab] MEDIAN arm=$arm%-5s $g%-34s ${med(results((g, arm)))}%7.2f s  (min ${results((g, arm)).min}%5.2f)")
    spark.stop()
  }
}
