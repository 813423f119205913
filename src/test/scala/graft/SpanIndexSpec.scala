package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{Corpus, SpanIndex}

/** The multi-threshold span index must answer EVERY minLen in its
  * [floor, cap] band with exactly the census path's output — intervals
  * AND mask rebuilds — including spans LONGER than cap (the capped-union
  * exactness proof in the object doc), within-doc self-overlap, identical
  * documents, and empty/short documents.
  */
class SpanIndexSpec extends SpanIndexFixtures {
  import spark.implicits._

  test("index answers every minLen in [floor, cap] exactly like the census") {
    val idx = SpanIndex.buildDuplicateSpanIndex(corpus, "doc_id", "text",
      floor = 3, cap = 6)
    idx.persist()
    for (l <- 3 to 6) {
      val fromIdx = intervalsSet(
        SpanIndex.spanIntervalsFromIndex(idx, corpus, "doc_id", "text", l))
      val fromCensus = intervalsSet(
        Corpus.duplicateSpanIntervals(corpus, "doc_id", "text",
          minLen = l, minCount = 2, countOccurrences = true))
      assert(fromIdx === fromCensus, s"intervals diverge at minLen=$l")
      val mIdx = maskMap(
        SpanIndex.maskFromSpanIndex(idx, corpus, "doc_id", "text", l))
      val mCensus = maskMap(
        Corpus.maskDuplicateSpans(corpus, "doc_id", "text", n = l,
          minDocs = 2, countOccurrences = true))
      assert(mIdx === mCensus, s"masks diverge at minLen=$l")
    }
    // spans longer than cap keep their TRUE extent: the 15-token block
    // is one maximal interval even though suffix keys were capped at 6
    val at6 = intervalsSet(
      SpanIndex.spanIntervalsFromIndex(idx, corpus, "doc_id", "text", 6))
    assert(at6.contains((1L, 1, 15, 15,
      "L1 L2 L3 L4 L5 L6 L7 L8 L9 L10 L11 L12 L13 L14 L15")))
    assert(at6.contains((2L, 2, 16, 15,
      "L1 L2 L3 L4 L5 L6 L7 L8 L9 L10 L11 L12 L13 L14 L15")))
    idx.unpersist()
  }

  test("index invariants: ascending positions, rlens within [floor, cap]") {
    val idx = SpanIndex.buildDuplicateSpanIndex(corpus, "doc_id", "text",
      floor = 3, cap = 6)
    val rows = idx.select($"doc_id", $"positions", $"rlens", $"__floor", $"__cap")
      .as[(Long, Seq[Int], Seq[Int], Int, Int)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (id, ps, rs, fl, cp) =>
      assert(fl === 3 && cp === 6)
      assert(ps.length === rs.length)
      assert(ps === ps.sorted && ps.distinct.length === ps.length,
        s"doc $id positions not strictly ascending: $ps")
      rs.foreach(r => assert(r >= 3 && r <= 6, s"doc $id r out of band: $r"))
    }
    // docs with nothing duplicated never appear
    val ids = rows.map(_._1).toSet
    assert(!ids.contains(7L) && !ids.contains(8L))
    // identical docs index at full length (capped)
    assert(ids.contains(9L) && ids.contains(10L) && ids.contains(11L))
  }

  test("band guard: minLen outside [floor, cap] raises") {
    val idx = SpanIndex.buildDuplicateSpanIndex(corpus, "doc_id", "text",
      floor = 3, cap = 6)
    for (bad <- Seq(2, 7)) {
      val e = intercept[Exception] {
        SpanIndex.spanIntervalsFromIndex(idx, corpus, "doc_id", "text", bad)
          .collect()
      }
      assert(e.getMessage.contains("outside index band") ||
        e.getCause != null &&
          e.getCause.getMessage.contains("outside index band"),
        s"unexpected error for minLen=$bad: ${e.getMessage}")
    }
  }

  test("shuffled census path (broadcastDups=false) builds the same index") {
    val a = SpanIndex.buildDuplicateSpanIndex(corpus, "doc_id", "text",
      floor = 3, cap = 6)
    val b = SpanIndex.buildDuplicateSpanIndex(corpus, "doc_id", "text",
      floor = 3, cap = 6, broadcastDups = Some(false))
    val toSet = (df: DataFrame) =>
      df.select($"doc_id", $"positions", $"rlens")
        .as[(Long, Seq[Int], Seq[Int])].collect().toSet
    assert(toSet(a) === toSet(b))
  }

  test("general minCount: index == census at thresholds 3 and 4") {
    // multiplicity ladder: a block in exactly 2 docs (invisible at
    // c >= 3), one in 3 docs, a WITHIN-doc double repeat + one other doc
    // (3 total occurrences), one in 5 docs
    val mc = docs(
      (1L, "two1 two2 two3 two4 end1"),
      (2L, "two1 two2 two3 two4 end2"),
      (3L, "three1 three2 three3 x1"),
      (4L, "three1 three2 three3 x2"),
      (5L, "three1 three2 three3 x3"),
      (6L, "rep1 rep2 rep3 rep1 rep2 rep3 tail"),
      (7L, "rep1 rep2 rep3 other"),
      (8L, "five1 five2 five3 a"), (9L, "five1 five2 five3 b"),
      (10L, "five1 five2 five3 c"), (11L, "five1 five2 five3 d"),
      (12L, "five1 five2 five3 e"))
    for (c <- Seq(3, 4); src <- Seq(mc, corpus)) {
      val idx = SpanIndex.buildDuplicateSpanIndex(src, "doc_id", "text",
        floor = 2, cap = 5, minCount = c)
      idx.persist()
      for (l <- 2 to 5) {
        val fromIdx = intervalsSet(
          SpanIndex.spanIntervalsFromIndex(idx, src, "doc_id", "text", l))
        val fromCensus = intervalsSet(
          Corpus.duplicateSpanIntervals(src, "doc_id", "text",
            minLen = l, minCount = c, countOccurrences = true))
        assert(fromIdx === fromCensus, s"minCount=$c minLen=$l")
      }
      idx.unpersist()
    }
    // self-overlap at high threshold: only the a^8 run has any 3-gram
    // with >= 5 occurrences (6 within one document)
    val idx5 = SpanIndex.buildDuplicateSpanIndex(corpus, "doc_id", "text",
      floor = 3, cap = 6, minCount = 5)
    val at5 = intervalsSet(
      SpanIndex.spanIntervalsFromIndex(idx5, corpus, "doc_id", "text", 3))
    assert(at5 === intervalsSet(Corpus.duplicateSpanIntervals(corpus,
      "doc_id", "text", minLen = 3, minCount = 5, countOccurrences = true)))
    assert(at5.map(_._1) === Set(12L))
  }

  test("crossDoc index == census distinct-doc counting at every minLen") {
    // the shared `corpus` separates the modes: doc 12's a^8 self-overlap
    // is occurrence-visible but lives in ONE document (must vanish), the
    // identical triple 9/10/11 is 3 distinct docs (must fully index via
    // the collapse's two labeled copies), and docs 1/2's 15-token block
    // must keep its true extent past cap under the capped-union argument
    val idx = SpanIndex.buildDuplicateSpanIndex(corpus, "doc_id", "text",
      floor = 3, cap = 6, crossDoc = true)
    idx.persist()
    for (l <- 3 to 6) {
      val fromIdx = intervalsSet(
        SpanIndex.spanIntervalsFromIndex(idx, corpus, "doc_id", "text", l))
      val fromCensus = intervalsSet(
        Corpus.duplicateSpanIntervals(corpus, "doc_id", "text",
          minLen = l, minCount = 2, countOccurrences = false))
      assert(fromIdx === fromCensus, s"crossDoc intervals diverge at minLen=$l")
      val mIdx = maskMap(
        SpanIndex.maskFromSpanIndex(idx, corpus, "doc_id", "text", l))
      val mCensus = maskMap(
        Corpus.maskDuplicateSpans(corpus, "doc_id", "text", n = l,
          minDocs = 2, countOccurrences = false))
      assert(mIdx === mCensus, s"crossDoc masks diverge at minLen=$l")
    }
    val rows = idx.select($"doc_id", $"__cross").as[(Long, Boolean)].collect()
    assert(rows.nonEmpty && rows.forall(_._2 === true))
    val ids = rows.map(_._1).toSet
    assert(!ids.contains(12L), "within-doc-only repeat must not index")
    assert(Set(9L, 10L, 11L).subsetOf(ids), "identical triple must index")
    // true extent past cap survives under cross-doc counting too
    assert(intervalsSet(
      SpanIndex.spanIntervalsFromIndex(idx, corpus, "doc_id", "text", 6))
      .contains((1L, 1, 15, 15,
        "L1 L2 L3 L4 L5 L6 L7 L8 L9 L10 L11 L12 L13 L14 L15")))
    idx.unpersist()
  }

  test("crossDoc: runs spanning partition boundaries fold exactly") {
    // a 120-token x-run puts >100 identical capped keys of ONE label in a
    // row — with 7 shuffle partitions that run MUST straddle several
    // boundaries, exercising the driver F/G seed folds (including the
    // all-same-label-partition chaining case) against the census truth
    val runs = docs(
      (21L, Seq.fill(120)("x").mkString(" ")),
      (22L, "x x x y " + Seq.fill(40)("x").mkString(" ")),
      (23L, "z1 x x x z2"),
      (24L, "solo tokens only"))
    val idx = SpanIndex.buildDuplicateSpanIndex(runs, "doc_id", "text",
      floor = 3, cap = 5, crossDoc = true)
    idx.persist()
    for (l <- 3 to 5) {
      val fromIdx = intervalsSet(
        SpanIndex.spanIntervalsFromIndex(idx, runs, "doc_id", "text", l))
      val fromCensus = intervalsSet(
        Corpus.duplicateSpanIntervals(runs, "doc_id", "text",
          minLen = l, minCount = 2, countOccurrences = false))
      assert(fromIdx === fromCensus, s"run-fixture diverges at minLen=$l")
    }
    // shuffled census path must agree as well
    val idxSh = SpanIndex.buildDuplicateSpanIndex(runs, "doc_id", "text",
      floor = 3, cap = 5, crossDoc = true, broadcastDups = Some(false))
    val toSet = (df: DataFrame) =>
      df.select($"doc_id", $"positions", $"rlens")
        .as[(Long, Seq[Int], Seq[Int])].collect().toSet
    assert(toSet(idx) === toSet(idxSh))
    idx.unpersist()
  }

  test("crossDoc mega-group: collapse keeps the scan linear and exact") {
    val big = docs(
      ((1L to 40L).map(i => (i, "c1 c2 c3 c4 c5 c6 c7 c8")) ++
        Seq((100L, "intra intra intra intra intra"),
          (101L, "solo only tokens here"), (102L, ""))): _*)
    val idx = SpanIndex.buildDuplicateSpanIndex(big, "doc_id", "text",
      floor = 3, cap = 5, crossDoc = true)
    for (l <- Seq(3, 5)) {
      val fromIdx = intervalsSet(
        SpanIndex.spanIntervalsFromIndex(idx, big, "doc_id", "text", l))
      val fromCensus = intervalsSet(
        Corpus.duplicateSpanIntervals(big, "doc_id", "text",
          minLen = l, minCount = 2, countOccurrences = false))
      assert(fromIdx === fromCensus, s"crossDoc mega-group diverges at $l")
    }
    // all 40 members fully duplicated; the intra-doc-only run is not
    val at5 = intervalsSet(
      SpanIndex.spanIntervalsFromIndex(idx, big, "doc_id", "text", 5))
    assert(at5.count(_._4 === 8) === 40)
    assert(!at5.exists(_._1 === 100L))
  }

  test("randomized census equivalence, both counting modes") {
    // tiny vocab -> dense accidental duplication: long same-label runs,
    // interleaved labels, within-doc repeats, and (injected) identical
    // copies — the adversarial layout for the run segmentation, the
    // driver F/G folds, and the collapse, none reachable by a
    // hand-built fixture. Seeded: failures reproduce.
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 3) {
      val vocab = 10
      val base = (1 to 24).map { i =>
        val n = rnd.nextInt(28) // 0 => empty doc
        (i.toLong, Seq.fill(n)("t" + rnd.nextInt(vocab)).mkString(" "))
      }
      val copies = base.take(2 + rnd.nextInt(4))
        .map { case (id, t) => (id + 1000L, t) }
      val df = docs((base ++ copies): _*)
      for (cross <- Seq(false, true)) {
        val idx = SpanIndex.buildDuplicateSpanIndex(df, "doc_id", "text",
          floor = 2, cap = 4, crossDoc = cross)
        idx.persist()
        for (l <- 2 to 4) {
          val fromIdx = intervalsSet(
            SpanIndex.spanIntervalsFromIndex(idx, df, "doc_id", "text", l))
          val fromCensus = intervalsSet(
            Corpus.duplicateSpanIntervals(df, "doc_id", "text", minLen = l,
              minCount = 2, countOccurrences = !cross))
          assert(fromIdx === fromCensus, s"trial=$trial cross=$cross minLen=$l")
        }
        idx.unpersist()
      }
      // occurrence mode at c = 3 over the same corpus (c-window scan)
      val idx3 = SpanIndex.buildDuplicateSpanIndex(df, "doc_id", "text",
        floor = 2, cap = 4, minCount = 3)
      idx3.persist()
      for (l <- 2 to 4) {
        val fromIdx = intervalsSet(
          SpanIndex.spanIntervalsFromIndex(idx3, df, "doc_id", "text", l))
        val fromCensus = intervalsSet(
          Corpus.duplicateSpanIntervals(df, "doc_id", "text", minLen = l,
            minCount = 3, countOccurrences = true))
        assert(fromIdx === fromCensus, s"trial=$trial c=3 minLen=$l")
      }
      idx3.unpersist()
    }
  }

  test("batched sweep == per-threshold single-form queries, both modes") {
    for (cross <- Seq(false, true)) {
      val idx = SpanIndex.buildDuplicateSpanIndex(corpus, "doc_id", "text",
        floor = 3, cap = 6, crossDoc = cross)
      idx.persist()
      val sweep = SpanIndex.spanIntervalsSweep(idx, corpus, "doc_id",
          "text", Seq(6, 3, 5, 3)) // unordered + duplicate: dedup'd
        .as[(Int, Long, Int, Int, Int, String)].collect().toSet
      val singles = Seq(3, 5, 6).flatMap { l =>
        SpanIndex.spanIntervalsFromIndex(idx, corpus, "doc_id", "text", l)
          .as[(Long, Int, Int, Int, String)].collect()
          .map(r => (l, r._1, r._2, r._3, r._4, r._5))
      }.toSet
      assert(sweep === singles, s"sweep diverges (cross=$cross)")
      idx.unpersist()
    }
    // band guard applies per exploded threshold
    val idx = SpanIndex.buildDuplicateSpanIndex(corpus, "doc_id", "text",
      floor = 3, cap = 6)
    val e = intercept[Exception] {
      SpanIndex.spanIntervalsSweep(idx, corpus, "doc_id", "text", Seq(3, 7))
        .collect()
    }
    assert(e.getMessage.contains("outside index band") ||
      e.getCause != null &&
        e.getCause.getMessage.contains("outside index band"))
  }

  test("batched MASK sweep == per-threshold single-form masks, both modes") {
    for (cross <- Seq(false, true)) {
      val idx = SpanIndex.buildDuplicateSpanIndex(corpus, "doc_id", "text",
        floor = 3, cap = 6, crossDoc = cross)
      idx.persist()
      val sweep = SpanIndex.maskSweepFromSpanIndex(idx, corpus, "doc_id",
          "text", Seq(6, 3, 5, 3)) // unordered + duplicate: dedup'd
        .as[(Int, Long, Long, Long, String)].collect().toSet
      val singles = Seq(3, 5, 6).flatMap { l =>
        SpanIndex.maskFromSpanIndex(idx, corpus, "doc_id", "text", l)
          .as[(Long, Long, Long, String)].collect()
          .map(r => (l, r._1, r._2, r._3, r._4))
      }.toSet
      assert(sweep === singles, s"mask sweep diverges (cross=$cross)")
      // docs absent from the index (7: empty, 8: nothing duplicated)
      // appear with full text at EVERY threshold
      for (l <- Seq(3, 5, 6)) {
        assert(sweep.contains((l, 8L, 2L, 0L, "one two")))
        assert(sweep.contains((l, 7L, 0L, 0L, "")))
      }
      idx.unpersist()
    }
    // band guard applies per exploded threshold
    val idx = SpanIndex.buildDuplicateSpanIndex(corpus, "doc_id", "text",
      floor = 3, cap = 6)
    val e = intercept[Exception] {
      SpanIndex.maskSweepFromSpanIndex(idx, corpus, "doc_id", "text",
        Seq(3, 7)).collect()
    }
    assert(e.getMessage.contains("outside index band") ||
      e.getCause != null &&
        e.getCause.getMessage.contains("outside index band"))
  }

  test("counting-mode guard: mismatched expectCrossDoc raises, match serves") {
    for (cross <- Seq(false, true)) {
      val idx = SpanIndex.buildDuplicateSpanIndex(corpus, "doc_id", "text",
        floor = 3, cap = 6, crossDoc = cross)
      idx.persist()
      // matching expectation: identical to the unchecked serve
      assert(intervalsSet(SpanIndex.spanIntervalsFromIndex(idx, corpus,
          "doc_id", "text", 3, expectCrossDoc = Some(cross))) ===
        intervalsSet(SpanIndex.spanIntervalsFromIndex(idx, corpus,
          "doc_id", "text", 3)))
      // mismatch raises at execution, on every serving function
      def raises(f: => DataFrame): Unit = {
        val e = intercept[Exception](f.collect())
        assert(e.getMessage.contains("counting-mode mismatch") ||
          e.getCause != null &&
            e.getCause.getMessage.contains("counting-mode mismatch"),
          s"unexpected error: ${e.getMessage}")
      }
      raises(SpanIndex.spanIntervalsFromIndex(idx, corpus, "doc_id",
        "text", 3, expectCrossDoc = Some(!cross)))
      raises(SpanIndex.spanIntervalsSweep(idx, corpus, "doc_id",
        "text", Seq(3, 5), expectCrossDoc = Some(!cross)))
      raises(SpanIndex.maskFromSpanIndex(idx, corpus, "doc_id",
        "text", 3, expectCrossDoc = Some(!cross)))
      raises(SpanIndex.maskSweepFromSpanIndex(idx, corpus, "doc_id",
        "text", Seq(3, 5), expectCrossDoc = Some(!cross)))
      idx.unpersist()
    }
  }

  test("crossDoc guard: minCount != 2 is rejected") {
    val e = intercept[IllegalArgumentException] {
      SpanIndex.buildDuplicateSpanIndex(corpus, "doc_id", "text",
        floor = 3, cap = 6, minCount = 3, crossDoc = true)
    }
    assert(e.getMessage.contains("crossDoc"))
  }
}
