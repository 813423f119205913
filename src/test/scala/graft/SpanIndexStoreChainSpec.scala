package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{Corpus, SpanIndex}

/** k randomized append batches chained THROUGH the stored sidecar
  * (VERDICT r14 #4) — second-heaviest test, isolated for the parallel
  * test groups. Split from SpanIndexSpec (r17).
  */
class SpanIndexStoreChainSpec extends SpanIndexFixtures {
  import spark.implicits._

  test("census append: k chained randomized batches through the store") {
    // VERDICT r14 #4: the chained spec extended past two batches —
    // four randomized appends chained THROUGH THE STORED SIDECAR
    // (appendSpanCensusStore lands each batch's delta in place; the
    // next batch probes the updated store — the flat-lineage chain the
    // scaladoc prescribes for corpus-scale sequences), including a
    // group-merge batch and a novel-vocabulary batch mid-chain; the
    // end state must equal one fresh build, and the final stored
    // census must equal a fresh census of everything
    val rnd = new scala.util.Random(15)
    val base = java.nio.file.Files.createTempDirectory("graft_cenk_")
    try {
      def mk(ids: Range): Seq[(Long, String)] = ids.map { i =>
        (i.toLong,
          Seq.fill(rnd.nextInt(20))("t" + rnd.nextInt(6)).mkString(" "))
      }
      var allRows = mk(1 to 14)
      val cenPath = base.resolve("cen").toString
      val (idx0, cen0) = SpanIndex.buildDuplicateSpanIndexWithCensus(
        docs(allRows: _*), "doc_id", "text", floor = 2, cap = 4)
      SpanIndex.writeSpanCensus(cen0, cenPath, buckets = 4)
      var cen = SpanIndex.readSpanCensus(spark, cenPath)
      var idx = idx0
      idx.persist()
      for (b <- 1 to 4) {
        var rows = mk(b * 100 to b * 100 + 4)
        if (b == 2) // identical-text merge into an existing group
          rows = rows :+ ((250L, allRows.head._2))
        if (b == 3) // novel vocabulary: the bloom-kill path mid-chain
          rows = rows.map { case (id, t) =>
            (id, t.split(" ").filter(_.nonEmpty).map("zz" + _)
              .mkString(" "))
          }
        val (idx2, _) = SpanIndex.appendToSpanIndexWithCensus(idx, cen,
          docs(allRows: _*), docs(rows: _*), "doc_id", "text", floor = 2,
          cap = 4, rebuildFraction = 10.0)
        idx2.persist()
        idx.unpersist()
        cen = SpanIndex.appendSpanCensusStore(spark, cenPath,
          docs(rows: _*), "doc_id", "text", floor = 2)
        allRows = allRows ++ rows
        idx = idx2
      }
      val full = SpanIndex.buildDuplicateSpanIndex(docs(allRows: _*),
        "doc_id", "text", floor = 2, cap = 4)
      assert(indexSet(idx) === indexSet(full))
      val fresh = SpanIndex.buildSpanCensus(docs(allRows: _*), "doc_id",
        "text", 2)
      assert(censusCounts(cen) === censusCounts(fresh))
      assert(groupSets(cen) === groupSets(fresh))
      // the store still carries every accelerator after k delta-appends
      assert(cen.counts.nonEmpty && cen.gramsByBucket.nonEmpty &&
        cen.bloom.nonEmpty)
      // guards on the store-append itself: overlapping ids refuse, a
      // wrong floor refuses
      val eId = intercept[IllegalArgumentException] {
        SpanIndex.appendSpanCensusStore(spark, cenPath,
          docs((1L, "x y")), "doc_id", "text", floor = 2)
      }
      assert(eId.getMessage.contains("share document ids"))
      val eFl = intercept[IllegalArgumentException] {
        SpanIndex.appendSpanCensusStore(spark, cenPath,
          docs((9999L, "x y")), "doc_id", "text", floor = 3)
      }
      assert(eFl.getMessage.contains("floor"))
      idx.unpersist()
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(base).iterator().asScala.toSeq
        .reverse.foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }
}
