package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit utility: prints the formatted physical plan of the named
  * queries (all queries if none given). Used to verify the scale posture of
  * each operator — filter/column pushdown reaching the parquet scan
  * (`PushedFilters`, `ReadSchema`), broadcast vs shuffle join choice, and
  * whole-stage-codegen span boundaries.
  *
  * Usage: runMain graft.Explain [queryName ...]
  *        runMain graft.Explain check [queryName ...]   — denylist sweep
  *          ([[PlanInvariants]]) over the named queries (default: ALL
  *          queries, including the action-driven ones — their final frame
  *          is still auditable); prints violations, exits 1 on any.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val checkMode = args.headOption.contains("check")
    val rest = if (checkMode) args.drop(1) else args
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      // check mode audits the STATIC plan (PlanInvariants scaladoc)
      .config("spark.sql.adaptive.enabled", (!checkMode).toString)
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    if (checkMode) {
      val names = if (rest.nonEmpty) rest.toSeq
        else SparkEntry.queries.keys.toSeq.sorted
      var bad = 0
      for (q <- names) {
        val vs = try PlanInvariants.check(SparkEntry.queries(q)(spark, sfDir),
          PlanInvariants.allow.getOrElse(q, Set.empty))
        catch { case e: Throwable => Seq(s"[error] ${e.getMessage}") }
        if (vs.nonEmpty) { bad += 1; vs.foreach(v => println(s"VIOLATION $q $v")) }
      }
      println(s"== plan check: ${names.size - bad} clean, $bad with violations ==")
      spark.stop()
      sys.exit(if (bad > 0) 1 else 0)
    }
    // These queries run actions (writes, counts) while CONSTRUCTING their
    // result DataFrame, so "explaining" them would execute real work and
    // print only the trivial final plan — skip unless named explicitly.
    val actionDriven = Set("q_write_read_lines", "q_triangles", "q_stats_actions",
      "q_pagerank", "q_kmeans", "q_select", "q_ann_ivf_disk", "q_percentiles",
      "q_bfs", "q_logreg", "q_sgd", "q_suffix_array",
      // round 3/4 gates that also act while constructing their result
      "q_simhash_pairs", "q_allgather", "q_cache", "q_execute",
      "q_write_lines_one", "q_lsh_near_dup", "q_sample_exact", "q_zip_window3h",
      // round-5 gates that act while constructing (persisted-index builds
      // return collectEager local relations; dup_clusters runs the CC loop)
      "q_ann_ivf_append", "q_ann_ivf_recluster", "q_dup_clusters",
      // source-format round trips write at construction time
      "q_read_csv", "q_read_json", "q_read_orc",
      // search-index build writes at construction time
      "q_search_disk",
      // round-8: persisted-index build + collectEager at construction
      "q_semantic_dedup_recall")
    val names = if (rest.nonEmpty) rest.toSeq
      else SparkEntry.queries.keys.toSeq.sorted.filterNot(actionDriven)
    for (q <- names) {
      println(s"===== $q =====")
      SparkEntry.queries(q)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
