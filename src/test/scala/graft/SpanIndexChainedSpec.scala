package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{Corpus, SpanIndex}

/** The chained-batch census append torture test — the suite's single
  * heaviest test (~5.5 min sequential), isolated in its own class so the
  * parallel test groups can schedule it alone. Split from SpanIndexSpec
  * (r17).
  */
class SpanIndexChainedSpec extends SpanIndexFixtures {
  import spark.implicits._

  test("census append: chained batches and randomized corpora") {
    // the sidecar's reason to exist: batch 2 appends against batch 1's
    // UPDATED census — never re-censusing the old text — and must still
    // equal the full rebuild over everything
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 2) {
      val vocab = 7
      def mk(ids: Range): Seq[(Long, String)] = ids.map { i =>
        (i.toLong,
          Seq.fill(rnd.nextInt(22))("t" + rnd.nextInt(vocab)).mkString(" "))
      }
      val old = mk(1 to 16)
      // batch 1 includes an identical copy of an old doc (group merge)
      val b1 = mk(100 to 104) :+ (105L, old.head._2)
      val b2 = mk(200 to 205) :+ (206L, b1.head._2)
      val (oldDf, b1Df, b2Df) = (docs(old: _*), docs(b1: _*), docs(b2: _*))
      for (cross <- Seq(false, true)) {
        val (idx0, cen0) = SpanIndex.buildDuplicateSpanIndexWithCensus(
          oldDf, "doc_id", "text", floor = 2, cap = 4, crossDoc = cross)
        idx0.persist()
        val (idx1, cen1) = SpanIndex.appendToSpanIndexWithCensus(idx0,
          cen0, oldDf, b1Df, "doc_id", "text", floor = 2, cap = 4,
          crossDoc = cross, rebuildFraction = 10.0)
        idx1.persist()
        val (idx2, cen2) = SpanIndex.appendToSpanIndexWithCensus(idx1,
          cen1, oldDf.unionByName(b1Df), b2Df, "doc_id", "text",
          floor = 2, cap = 4, crossDoc = cross, rebuildFraction = 10.0)
        val all = oldDf.unionByName(b1Df).unionByName(b2Df)
        val full = SpanIndex.buildDuplicateSpanIndex(all, "doc_id",
          "text", floor = 2, cap = 4, crossDoc = cross)
        assert(indexSet(idx2) === indexSet(full),
          s"trial=$trial cross=$cross")
        val fresh = SpanIndex.buildSpanCensus(all, "doc_id", "text", 2)
        assert(censusCounts(cen2) === censusCounts(fresh),
          s"trial=$trial cross=$cross")
        idx0.unpersist(); idx1.unpersist()
      }
    }
  }
}
