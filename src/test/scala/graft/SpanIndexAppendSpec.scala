package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{Corpus, SpanIndex}

/** Incremental append (appendToSpanIndex): append == rebuild over the
  * union in every counting mode, guards, rebuild-fallback dispatch, and
  * stored-index round trips. Split from SpanIndexSpec (r17).
  */
class SpanIndexAppendSpec extends SpanIndexFixtures {
  import spark.implicits._

  test("append == full rebuild over the union, both modes") {
    // old corpus: the shared fixture; new docs hit every append case —
    // a new-new duplicate pair, a new doc matching an OLD-only gram
    // (raising an old doc's R / pulling an unindexed old doc in), a new
    // copy of an identical-group text, a within-doc-only repeat (must
    // stay invisible under crossDoc), and a unique doc
    val newbies = docs(
      (50L, "n1 n2 n3 n4 n5 end"),
      (51L, "n1 n2 n3 n4 n5 tail"),
      (52L, "p q r s t9"), // extends old docs 5/6's shared gram family
      (53L, "dup1 dup2 dup3 dup4"), // joins the identical triple
      (54L, "w1 e1 e2 e3"), // identical to OLD doc 13
      (55L, "iq1 iq2 iq3 iq1 iq2 iq3"), // within-doc repeat only
      (56L, "zz1 zz2 zz3"))
    for (cross <- Seq(false, true)) {
      val idx = SpanIndex.buildDuplicateSpanIndex(corpus, "doc_id", "text",
        floor = 3, cap = 6, crossDoc = cross)
      idx.persist()
      val full = SpanIndex.buildDuplicateSpanIndex(
        corpus.unionByName(newbies), "doc_id", "text",
        floor = 3, cap = 6, crossDoc = cross)
      val app = SpanIndex.appendToSpanIndex(idx, corpus, newbies,
        "doc_id", "text", floor = 3, cap = 6, crossDoc = cross,
        rebuildFraction = 10.0) // force the incremental path
      assert(indexSet(app) === indexSet(full), s"append != rebuild (cross=$cross)")
      // the rebuild-threshold fallback must agree too
      val viaRebuild = SpanIndex.appendToSpanIndex(idx, corpus, newbies,
        "doc_id", "text", floor = 3, cap = 6, crossDoc = cross,
        rebuildFraction = 0.0)
      assert(indexSet(viaRebuild) === indexSet(full))
      idx.unpersist()
    }
  }

  test("append: occurrence minCount = 3 and randomized corpora match rebuild") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 3) {
      val vocab = 8
      val old = (1 to 18).map { i =>
        (i.toLong, Seq.fill(rnd.nextInt(24))("t" + rnd.nextInt(vocab)).mkString(" "))
      }
      val nw = (100 to 100 + rnd.nextInt(5)).map { i =>
        (i.toLong, Seq.fill(rnd.nextInt(24))("t" + rnd.nextInt(vocab)).mkString(" "))
      }
      val oldDf = docs(old: _*)
      val newDf = docs(nw: _*)
      for ((cross, c) <- Seq((false, 2), (false, 3), (true, 2))) {
        val idx = SpanIndex.buildDuplicateSpanIndex(oldDf, "doc_id", "text",
          floor = 2, cap = 4, minCount = c, crossDoc = cross)
        idx.persist()
        val full = SpanIndex.buildDuplicateSpanIndex(
          oldDf.unionByName(newDf), "doc_id", "text",
          floor = 2, cap = 4, minCount = c, crossDoc = cross)
        val app = SpanIndex.appendToSpanIndex(idx, oldDf, newDf,
          "doc_id", "text", floor = 2, cap = 4, minCount = c,
          crossDoc = cross, rebuildFraction = 10.0)
        assert(indexSet(app) === indexSet(full),
          s"trial=$trial cross=$cross c=$c")
        idx.unpersist()
      }
    }
  }

  test("append: empty old index (dup-free old corpus) and param guard") {
    val old = docs((1L, "a1 b1 c1 d1"), (2L, "a2 b2 c2 d2"))
    val idx = SpanIndex.buildDuplicateSpanIndex(old, "doc_id", "text",
      floor = 3, cap = 6)
    assert(idx.count() === 0)
    val nw = docs((3L, "a1 b1 c1 d1")) // duplicates old doc 1
    val app = SpanIndex.appendToSpanIndex(idx, old, nw, "doc_id", "text",
      floor = 3, cap = 6, rebuildFraction = 10.0)
    val full = SpanIndex.buildDuplicateSpanIndex(old.unionByName(nw),
      "doc_id", "text", floor = 3, cap = 6)
    assert(indexSet(app) === indexSet(full))
    assert(indexSet(app).map(_._1) === Set(1L, 3L))
    // mismatched parameters against a non-empty index raise
    val e = intercept[IllegalArgumentException] {
      SpanIndex.appendToSpanIndex(full, old.unionByName(nw), nw,
        "doc_id", "text", floor = 3, cap = 8)
    }
    assert(e.getMessage.contains("index records"))
    // OVERLAPPING ids are a corrupt-index hazard (two documents'
    // position arrays max-merge under one id) — the auto validation
    // catches them on small/unknown-stats inputs
    val e2 = intercept[IllegalArgumentException] {
      SpanIndex.appendToSpanIndex(full, old.unionByName(nw), nw,
        "doc_id", "text", floor = 3, cap = 6)
    }
    assert(e2.getMessage.contains("share document ids"))
    // and Some(false) skips the check (the known-large escape hatch)
    SpanIndex.appendToSpanIndex(full, old.unionByName(nw), nw,
      "doc_id", "text", floor = 3, cap = 6, rebuildFraction = 1e9,
      validateDisjointIds = Some(false))
  }

  test("append decides the rebuild fallback from plan stats, no corpus scan") {
    // shouldRebuild must be a pure plan-statistics predicate: parquet-
    // backed frames carry file-size stats, so the decision flips with
    // rebuildFraction without running a job — the round-13 replacement
    // for two eager full-corpus count()s
    val base = java.nio.file.Files.createTempDirectory("graft_sidx_stats_")
    try {
      val oldP = base.resolve("old").toString
      val newP = base.resolve("new").toString
      // sized so DATA dominates parquet footer overhead (a 10-row file's
      // bytes are mostly metadata, which would swamp the ratio)
      docs((1 to 3000).map(i =>
          (i.toLong, (1 to 30).map(j => s"w${i}_$j").mkString(" "))): _*)
        .coalesce(1).write.parquet(oldP)
      docs((100000 to 100029).map(i =>
          (i.toLong, (1 to 30).map(j => s"n${i}_$j").mkString(" "))): _*)
        .coalesce(1).write.parquet(newP)
      val o = spark.read.parquet(oldP)
      val n = spark.read.parquet(newP)
      // the 10% delta stays incremental at the default-ish fraction...
      assert(!SpanIndex.shouldRebuild(o, n, rebuildFraction = 0.5))
      // ...and falls back once the fraction says any delta is too big
      assert(SpanIndex.shouldRebuild(o, n, rebuildFraction = 0.0))
      assert(SpanIndex.shouldRebuild(o, o, rebuildFraction = 0.5))
      // UNKNOWN stats (RDD-backed frame: the defaultSizeInBytes
      // sentinel) keep the incremental path
      val unk = spark.createDataFrame(o.rdd, o.schema)
      assert(!SpanIndex.shouldRebuild(unk, n, rebuildFraction = 0.0))
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(base).iterator().asScala.toSeq
        .reverse.foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  test("stored index round trip: serves read the parquet store, not a rebuild") {
    // the q_span_index_disk regime — write the index, re-read, serve;
    // results must match in-session serving and the serve plan must scan
    // the STORE (no suffix-sort machinery above the index side)
    val base = java.nio.file.Files.createTempDirectory("graft_sidx_disk_")
    try {
      val idxP = base.resolve("idx").toString
      val built = SpanIndex.buildDuplicateSpanIndex(corpus, "doc_id",
        "text", floor = 3, cap = 6)
      built.write.parquet(idxP)
      val stored = spark.read.parquet(idxP)
      for (l <- Seq(3, 5)) {
        val mem = intervalsSet(
          SpanIndex.spanIntervalsFromIndex(built, corpus, "doc_id", "text", l))
        val dsk = intervalsSet(
          SpanIndex.spanIntervalsFromIndex(stored, corpus, "doc_id", "text", l))
        assert(dsk === mem, s"stored serve diverges at minLen=$l")
      }
      val served = SpanIndex.spanIntervalsFromIndex(stored, corpus,
        "doc_id", "text", 3)
      val plan = served.queryExecution.executedPlan.toString
      assert(plan.contains("idx"), s"serve should scan the store:\n$plan")
      assert(!plan.toLowerCase.contains("sortwithinpartitions") &&
        !plan.contains("RangePartitioning"),
        s"serve must not rebuild (range sort present):\n$plan")
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(base).iterator().asScala.toSeq
        .reverse.foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  test("stored d>=3 index round trip: serves read the store, not a rebuild") {
    // the q_span_index_d3_disk regime — the minDocs = 3 (block-scan)
    // index must survive the same offline-build / interactive-serve
    // round trip as the occurrence index: results identical to
    // in-session serving, and the serve plan scans the STORE with no
    // suffix-sort machinery (the block scan's census runs at BUILD time
    // only; a serve that re-sorted would betray a hidden rebuild)
    val base = java.nio.file.Files.createTempDirectory("graft_sidx3_disk_")
    try {
      val idxP = base.resolve("idx").toString
      val built = SpanIndex.buildDuplicateSpanIndex(corpus, "doc_id",
        "text", floor = 3, cap = 6, crossDoc = true, minDocs = 3)
      built.write.parquet(idxP)
      val stored = spark.read.parquet(idxP)
      for (l <- Seq(3, 5)) {
        val mem = intervalsSet(
          SpanIndex.spanIntervalsFromIndex(built, corpus, "doc_id", "text", l))
        val dsk = intervalsSet(
          SpanIndex.spanIntervalsFromIndex(stored, corpus, "doc_id", "text", l))
        assert(dsk === mem, s"stored d3 serve diverges at minLen=$l")
      }
      val served = SpanIndex.spanIntervalsFromIndex(stored, corpus,
        "doc_id", "text", 3)
      val plan = served.queryExecution.executedPlan.toString
      assert(plan.contains("idx"), s"serve should scan the store:\n$plan")
      assert(!plan.toLowerCase.contains("sortwithinpartitions") &&
        !plan.contains("RangePartitioning"),
        s"serve must not rebuild (range sort present):\n$plan")
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(base).iterator().asScala.toSeq
        .reverse.foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  test("adversarial distribution: one giant identical group plus uniques") {
    // 40 identical copies + unique docs; equivalence must hold and the
    // identical group's members all index as fully-duplicated
    val big = docs(
      ((1L to 40L).map(i => (i, "c1 c2 c3 c4 c5 c6 c7 c8")) ++
        Seq((100L, "solo only tokens here"), (101L, ""))): _*)
    val idx = SpanIndex.buildDuplicateSpanIndex(big, "doc_id", "text",
      floor = 3, cap = 5)
    for (l <- Seq(3, 5)) {
      val fromIdx = intervalsSet(
        SpanIndex.spanIntervalsFromIndex(idx, big, "doc_id", "text", l))
      val fromCensus = intervalsSet(
        Corpus.duplicateSpanIntervals(big, "doc_id", "text",
          minLen = l, minCount = 2, countOccurrences = true))
      assert(fromIdx === fromCensus, s"mega-group diverges at minLen=$l")
    }
    assert(intervalsSet(
      SpanIndex.spanIntervalsFromIndex(idx, big, "doc_id", "text", 5))
      .count(_._4 === 8) === 40)
  }

  test("minDocs 3/4: block-scan index == census at every minLen") {
    // fixture discriminates d = 2 / 3 / 4 level-by-level: a 2-doc block
    // (vanishes at d = 3), a 3-doc block longer than cap (capped-union
    // extent must survive at d = 3, vanish at d = 4), identical-copy
    // groups of m = 3 and m = 4 (the singleton-block / group-size path),
    // and a within-doc repeat (never cross-doc at any d)
    val fx = docs(
      (1L, "p1 p2 p3 p4 p5 u1"),
      (2L, "p1 p2 p3 p4 p5 u2"),
      (3L, "T1 T2 T3 T4 T5 T6 T7 T8 T9 v1"),
      (4L, "v2 T1 T2 T3 T4 T5 T6 T7 T8 T9"),
      (5L, "T1 T2 T3 T4 T5 T6 T7 T8 T9 v3"),
      (6L, "m m m m m m"),
      (7L, "c1 c2 c3 c4"), (8L, "c1 c2 c3 c4"), (9L, "c1 c2 c3 c4"),
      (10L, "q1 q2 q3"), (11L, "q1 q2 q3"),
      (12L, "q1 q2 q3"), (13L, "q1 q2 q3"),
      (14L, ""), (15L, "x"))
    for (d <- Seq(3, 4)) {
      val idx = SpanIndex.buildDuplicateSpanIndex(fx, "doc_id", "text",
        floor = 3, cap = 6, crossDoc = true, minDocs = d)
      idx.persist()
      for (l <- 3 to 6) {
        val fromIdx = intervalsSet(
          SpanIndex.spanIntervalsFromIndex(idx, fx, "doc_id", "text", l))
        val fromCensus = intervalsSet(
          Corpus.duplicateSpanIntervals(fx, "doc_id", "text", minLen = l,
            minCount = d, countOccurrences = false))
        assert(fromIdx === fromCensus, s"d=$d intervals diverge at minLen=$l")
        val mIdx = maskMap(
          SpanIndex.maskFromSpanIndex(idx, fx, "doc_id", "text", l))
        val mCensus = maskMap(
          Corpus.maskDuplicateSpans(fx, "doc_id", "text", n = l,
            minDocs = d, countOccurrences = false))
        assert(mIdx === mCensus, s"d=$d masks diverge at minLen=$l")
      }
      val ids = idx.select($"doc_id").as[Long].collect().toSet
      assert(!ids.contains(1L) && !ids.contains(6L),
        s"2-doc / within-doc content must not index at d=$d")
      assert(Set(10L, 11L, 12L, 13L).subsetOf(ids),
        s"m=4 identical group must index at d=$d")
      assert(ids.contains(3L) === (d == 3), "3-doc block indexes iff d=3")
      assert(ids.contains(7L) === (d == 3), "m=3 group indexes iff d=3")
      if (d == 3)
        // the 9-token triple block's true extent survives past cap = 6
        assert(intervalsSet(SpanIndex.spanIntervalsFromIndex(
          idx, fx, "doc_id", "text", 6))
          .contains((3L, 1, 9, 9, "T1 T2 T3 T4 T5 T6 T7 T8 T9")))
      // recorded mode: __minc carries d, __cross stays true
      val hdr = idx.select($"__minc", $"__cross")
        .as[(Int, Boolean)].head()
      assert(hdr === ((d, true)))
      idx.unpersist()
    }
  }

  test("minDocs = 3: blocks spanning partition boundaries fold exactly") {
    // graded document frequency BY LEVEL: x^3 lives in 4 docs, x^5 in 3
    // — so eligibility flips between levels inside one giant run of
    // equal capped keys that must straddle the 7 shuffle partitions,
    // exercising the per-level lastBreak seeds and the 2-row boundary
    // entry-LCP warm-up
    val runs = docs(
      (21L, Seq.fill(120)("x").mkString(" ")),
      (22L, "a1 " + Seq.fill(90)("x").mkString(" ")),
      (23L, "b1 b2 " + Seq.fill(60)("x").mkString(" ")),
      (24L, "x x x only"),
      (25L, "solo tokens"))
    for (d <- Seq(3, 4)) {
      val idx = SpanIndex.buildDuplicateSpanIndex(runs, "doc_id", "text",
        floor = 3, cap = 5, crossDoc = true, minDocs = d)
      idx.persist()
      for (l <- 3 to 5) {
        val fromIdx = intervalsSet(
          SpanIndex.spanIntervalsFromIndex(idx, runs, "doc_id", "text", l))
        val fromCensus = intervalsSet(
          Corpus.duplicateSpanIntervals(runs, "doc_id", "text", minLen = l,
            minCount = d, countOccurrences = false))
        assert(fromIdx === fromCensus, s"d=$d run fixture diverges at $l")
      }
      idx.unpersist()
    }
  }

  test("block scan at d = 2 equals the nearest-different-document scan") {
    // the two algorithms share the d = 2 regime; pin them EQUAL on
    // randomized corpora (dense accidental duplication, identical-copy
    // groups) — the strongest cross-check either implementation has
    val rnd = new scala.util.Random(1234)
    for (trial <- 1 to 3) {
      val base = (1 to 20).map { i =>
        val n = rnd.nextInt(25)
        (i.toLong, Seq.fill(n)("t" + rnd.nextInt(8)).mkString(" "))
      }
      val copies = base.take(1 + rnd.nextInt(4))
        .map { case (id, t) => (id + 500L, t) }
      val df = docs((base ++ copies): _*)
      val std = SpanIndex.buildDuplicateSpanIndex(df, "doc_id", "text",
        floor = 2, cap = 4, crossDoc = true)
      val blk = SpanIndex.buildIndexInternal(df, "doc_id", "text",
        floor = 2, cap = 4, minCount = 2, broadcastDups = None,
        crossDoc = true, minDocs = 2, blockScanAtD2 = true)
      assert(indexSet(std) === indexSet(blk), s"trial $trial")
    }
  }

  test("randomized minDocs 3/4 census equivalence") {
    // tiny vocab -> many natural >= 3-doc grams; identical triples via
    // two copy layers exercise the singleton m >= d path at random
    val rnd = new scala.util.Random(77)
    for (trial <- 1 to 3) {
      val base = (1 to 24).map { i =>
        val n = rnd.nextInt(24)
        (i.toLong, Seq.fill(n)("t" + rnd.nextInt(6)).mkString(" "))
      }
      val copies = base.take(3 + rnd.nextInt(3))
        .map { case (id, t) => (id + 1000L, t) }
      val copies2 = base.take(rnd.nextInt(3))
        .map { case (id, t) => (id + 2000L, t) }
      val df = docs((base ++ copies ++ copies2): _*)
      for (d <- Seq(3, 4)) {
        val idx = SpanIndex.buildDuplicateSpanIndex(df, "doc_id", "text",
          floor = 2, cap = 4, crossDoc = true, minDocs = d)
        idx.persist()
        for (l <- 2 to 4) {
          val fromIdx = intervalsSet(
            SpanIndex.spanIntervalsFromIndex(idx, df, "doc_id", "text", l))
          val fromCensus = intervalsSet(
            Corpus.duplicateSpanIntervals(df, "doc_id", "text", minLen = l,
              minCount = d, countOccurrences = false))
          assert(fromIdx === fromCensus, s"trial=$trial d=$d minLen=$l")
        }
        idx.unpersist()
      }
    }
  }
}
