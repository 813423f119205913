package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** r17 plan-evidence helper (temporary round tooling, like PlanDump):
  * writes the connected-components ONE-ROUND plans — the r16 round shape
  * reproduced inline from git history (commit d60ab8e) as `before`, and
  * both arms of the r17 shape via [[graft.operators.ConnectedComponents
  * .roundFor]] as `after`. The loop runs eagerly inside the cluster
  * gates' builders, so gate-level explains never contain the round —
  * this is the committed evidence for the exchange-count claims in
  * OPTIMIZATION_r17.md. Args: <outDir>.
  */
object CCRoundPlan {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("plans/r17")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      // the dump's edge leaf is toy-sized and Catalyst would broadcast
      // every join, hiding the at-scale shapes the round dispatch is
      // about; disabling auto-broadcast shows the SMJ/shuffle regime
      // (the explicit broadcast(m) hints of the small arm still apply)
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))
    // representative edge leaf (same shape the loop materializes)
    val e = spark.range(100000)
      .select((col("id") + 1L).as("u"), expr("id div 3").as("v"))

    // the r16 round, verbatim from the pre-change code
    def largeStarOld(e: DataFrame): DataFrame = {
      val bidir = e.select(col("u"), col("v"))
        .union(e.select(col("v").as("u"), col("u").as("v")))
      val m = bidir.groupBy("u").agg(min(col("v")).as("mv"))
        .select(col("u"), least(col("mv"), col("u")).as("m"))
      bidir.join(m, "u")
        .filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .distinct()
    }
    def smallStarOld(e: DataFrame): DataFrame = {
      val or = e.select(greatest(col("u"), col("v")).as("u"),
          least(col("u"), col("v")).as("v"))
        .filter(col("u") =!= col("v"))
      val m = or.groupBy("u").agg(min(col("v")).as("m"))
      val fromNbrs = or.join(m, "u")
        .filter(col("v") =!= col("m"))
        .select(col("v").as("u"), col("m").as("v"))
      val fromSelf = m.select(col("u"), col("m").as("v"))
      fromNbrs.union(fromSelf).distinct()
    }

    // executed-stage/task counters — the ground truth the explain text
    // can't give (formatted plans print shared subtrees once per branch,
    // so id-counting overcounts; see the r16 verdict's evidence note)
    val stages = new java.util.concurrent.atomic.AtomicInteger
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageSubmitted(
            s: org.apache.spark.scheduler.SparkListenerStageSubmitted): Unit = {
          stages.incrementAndGet()
        }
      })

    def dump(name: String, df: DataFrame): Unit = {
      // collect() drives the Dataset's OWN QueryExecution, so the dumped
      // plan is the FINAL adaptive plan with ReusedExchange nodes — the
      // executed evidence, not the pre-AQE initial plan (whose textual
      // subtree duplication hides runtime exchange reuse)
      stages.set(0)
      df.collect()
      Thread.sleep(500) // let the async listener bus drain
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      val hdr = s"== Executed stages for this one-round collect: " +
        s"${stages.get()} ==\n\n"
      Files.writeString(Paths.get(s"$outDir/$name.txt"), hdr + plan)
      println(s"[ccplan] $name stages=${stages.get()} -> $outDir/$name.txt")
    }
    dump("cc_round_before", smallStarOld(largeStarOld(e)))
    dump("cc_round_after_exchange",
      graft.operators.ConnectedComponents.roundFor(e, broadcastMin = false))
    dump("cc_round_after_broadcast",
      graft.operators.ConnectedComponents.roundFor(e, broadcastMin = true))
    spark.stop()
  }
}
