package graft

/** Smoke: every declared query runs end-to-end on sf0.001 and the flagship
  * returns rows. Value-level correctness is the DuckDB oracle gate
  * (tools/check_oracles.py, driven by graft.Verify).
  */
class QueriesSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("every query has either an oracle or a documented rows-only check") {
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    // keep the rows-only set deliberate and small
    assert(noOracle.subsetOf(
      Set("q_hll", "q_simhash", "q_lang_id", "q_ann_topk", "q_ann_ivf",
        "q_pagerank")), noOracle)
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name runs at sf0.001") {
      val df = fn(spark, sf)
      assert(df.count() >= 0)
    }
  }
}
