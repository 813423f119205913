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
class SpanIndexSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*): DataFrame =
    rows.toDF("doc_id", "text")

  // shared 15-token block (longer than cap=6), a 5-token block, a
  // floor-length 3-token block, an end-of-doc block, identical docs, a
  // self-overlapping single-token run, an empty and a too-short doc
  private lazy val corpus = docs(
    (1L, "L1 L2 L3 L4 L5 L6 L7 L8 L9 L10 L11 L12 L13 L14 L15 u1"),
    (2L, "z1 L1 L2 L3 L4 L5 L6 L7 L8 L9 L10 L11 L12 L13 L14 L15"),
    (3L, "a b c d e x1"),
    (4L, "a b c d e y1"),
    (5L, "p q r s"),
    (6L, "t p q r"),
    (7L, ""),
    (8L, "one two"),
    (9L, "dup1 dup2 dup3 dup4"),
    (10L, "dup1 dup2 dup3 dup4"),
    (11L, "dup1 dup2 dup3 dup4"),
    (12L, "a a a a a a a a"),
    (13L, "w1 e1 e2 e3"),
    (14L, "w2 e1 e2 e3"))

  private def intervalsSet(df: DataFrame): Set[(Long, Int, Int, Int, String)] =
    df.as[(Long, Int, Int, Int, String)].collect().toSet

  private def maskMap(df: DataFrame): Map[Long, (Long, Long, String)] =
    df.as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

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

  private def indexSet(df: DataFrame): Set[(Long, Seq[Int], Seq[Int])] =
    df.select($"doc_id", $"positions", $"rlens")
      .as[(Long, Seq[Int], Seq[Int])].collect().toSet

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

  // derived per-gram counts (total occurrences, distinct docs) — the
  // census stores neither; both must fall out of grams ⋈ member counts
  private def censusCounts(
      c: SpanIndex.SpanCensus): Map[Long, (Long, Long)] = {
    val m = c.members.groupBy($"__gid").agg(count(lit(1)).as("__m"))
    c.grams.join(m, Seq("__gid"))
      .groupBy($"__fh")
      .agg(sum($"__pcnt" * $"__m").as("occ"), sum($"__m").as("dc"))
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
  }

  // identical-text partition as member-id sets (gid values may legally
  // differ between an incrementally-updated census and a fresh one)
  private def groupSets(c: SpanIndex.SpanCensus): Set[Set[Long]] =
    c.members.select($"__gid", $"__member").as[(Long, Long)].collect()
      .groupBy(_._1).values.map(_.map(_._2).toSet).toSet

  test("census append == rebuild, all modes; updated census == fresh") {
    // same new-doc case coverage as the legacy append spec: new-new dup
    // pair, old-gram extension, identical-text merges into an old group,
    // within-doc-only repeat, unique doc
    val newbies = docs(
      (50L, "n1 n2 n3 n4 n5 end"),
      (51L, "n1 n2 n3 n4 n5 tail"),
      (52L, "p q r s t9"),
      (53L, "dup1 dup2 dup3 dup4"),
      (54L, "w1 e1 e2 e3"),
      (55L, "iq1 iq2 iq3 iq1 iq2 iq3"),
      (56L, "zz1 zz2 zz3"))
    val union = corpus.unionByName(newbies)
    for ((cross, c, d) <- Seq((false, 2, 2), (false, 3, 2),
        (true, 2, 2), (true, 2, 3))) {
      val (idx, cen) = SpanIndex.buildDuplicateSpanIndexWithCensus(corpus,
        "doc_id", "text", floor = 3, cap = 6, minCount = c,
        crossDoc = cross, minDocs = d)
      idx.persist()
      val full = SpanIndex.buildDuplicateSpanIndex(union, "doc_id",
        "text", floor = 3, cap = 6, minCount = c, crossDoc = cross,
        minDocs = d)
      val (app, upd) = SpanIndex.appendToSpanIndexWithCensus(idx, cen,
        corpus, newbies, "doc_id", "text", floor = 3, cap = 6,
        minCount = c, crossDoc = cross, minDocs = d,
        rebuildFraction = 10.0) // force the incremental path
      assert(indexSet(app) === indexSet(full),
        s"census append != rebuild (cross=$cross c=$c d=$d)")
      val fresh = SpanIndex.buildSpanCensus(union, "doc_id", "text", 3)
      assert(censusCounts(upd) === censusCounts(fresh),
        s"updated census counts diverge (cross=$cross c=$c d=$d)")
      assert(groupSets(upd) === groupSets(fresh),
        s"updated census groups diverge (cross=$cross c=$c d=$d)")
      idx.unpersist()
    }
  }

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

  test("census append: stored round trip, fallback, and guards") {
    val base = java.nio.file.Files.createTempDirectory("graft_cen_")
    try {
      val old = corpus
      val nw = docs((60L, "dup1 dup2 dup3 dup4"), (61L, "f1 f2 f3"),
        (62L, "f1 f2 f3"))
      val (idx, cen) = SpanIndex.buildDuplicateSpanIndexWithCensus(old,
        "doc_id", "text", floor = 3, cap = 6)
      SpanIndex.writeSpanCensus(cen, base.resolve("cen").toString)
      val stored = SpanIndex.readSpanCensus(spark,
        base.resolve("cen").toString)
      val full = SpanIndex.buildDuplicateSpanIndex(old.unionByName(nw),
        "doc_id", "text", floor = 3, cap = 6)
      val (app, _) = SpanIndex.appendToSpanIndexWithCensus(idx, stored,
        old, nw, "doc_id", "text", floor = 3, cap = 6,
        rebuildFraction = 10.0)
      assert(indexSet(app) === indexSet(full))
      // rebuildFraction = 0 forces the rebuild branch — result and
      // census must both still be the union's
      val oldP = base.resolve("old").toString
      val nwP = base.resolve("nw").toString
      old.write.parquet(oldP); nw.write.parquet(nwP)
      val (viaRebuild, cenR) = SpanIndex.appendToSpanIndexWithCensus(idx,
        stored, spark.read.parquet(oldP), spark.read.parquet(nwP),
        "doc_id", "text", floor = 3, cap = 6, rebuildFraction = 0.0)
      assert(indexSet(viaRebuild) === indexSet(full))
      assert(censusCounts(cenR) ===
        censusCounts(SpanIndex.buildSpanCensus(old.unionByName(nw),
          "doc_id", "text", 3)))
      // overlapping ids are a corrupt-index hazard — the members-based
      // check (scalar, always on) must refuse
      val eId = intercept[IllegalArgumentException] {
        SpanIndex.appendToSpanIndexWithCensus(idx, stored, old,
          docs((1L, "x y z")), "doc_id", "text", floor = 3, cap = 6,
          rebuildFraction = 10.0)
      }
      assert(eId.getMessage.contains("share document ids"))
      // a census cut at a different floor must refuse
      val cenWrong = SpanIndex.buildSpanCensus(old, "doc_id", "text", 2)
      val eFl = intercept[IllegalArgumentException] {
        SpanIndex.appendToSpanIndexWithCensus(idx, cenWrong, old, nw,
          "doc_id", "text", floor = 3, cap = 6, rebuildFraction = 10.0)
      }
      assert(eFl.getMessage.contains("floor"))
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(base).iterator().asScala.toSeq
        .reverse.foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  test("stored census v2: bloom + bucket-pruned probe == rebuild, both modes") {
    // the round-15 store accelerators (counts frame, partitioned grams,
    // corpus bloom) change WHERE the probe reads, never what it finds:
    // an overlapping delta (survivors + pruned bucket read) and a novel
    // delta (bloom kills everything — zero buckets read) must both still
    // equal the full rebuild, and the updated census must keep the
    // accelerators live for the NEXT batch (chaining)
    val base = java.nio.file.Files.createTempDirectory("graft_cenv2_")
    try {
      for (cross <- Seq(false, true)) {
        val (idx, cen) = SpanIndex.buildDuplicateSpanIndexWithCensus(corpus,
          "doc_id", "text", floor = 3, cap = 6, crossDoc = cross)
        idx.persist()
        val p = base.resolve(s"cen_$cross").toString
        SpanIndex.writeSpanCensus(cen, p, buckets = 8)
        val stored = SpanIndex.readSpanCensus(spark, p)
        assert(stored.counts.nonEmpty && stored.gramsByBucket.nonEmpty &&
          stored.bloom.nonEmpty, "store must carry all three accelerators")
        assert(stored.bloom.get.buckets === 8)
        val nw = docs((70L, "dup1 dup2 dup3 dup4"), (71L, "a b c d e q9"))
        val full = SpanIndex.buildDuplicateSpanIndex(
          corpus.unionByName(nw), "doc_id", "text", floor = 3, cap = 6,
          crossDoc = cross)
        val (app, upd) = SpanIndex.appendToSpanIndexWithCensus(idx, stored,
          corpus, nw, "doc_id", "text", floor = 3, cap = 6,
          crossDoc = cross, rebuildFraction = 10.0)
        assert(indexSet(app) === indexSet(full), s"cross=$cross overlap")
        assert(upd.counts.nonEmpty && upd.gramsByBucket.nonEmpty &&
          upd.bloom.nonEmpty, "updated census must keep the accelerators")
        val novel = docs((80L, "nv1 nv2 nv3 nv4 nv5"),
          (81L, "nv1 nv2 nv3 nv4 nv5"))
        val fullN = SpanIndex.buildDuplicateSpanIndex(
          corpus.unionByName(nw).unionByName(novel), "doc_id", "text",
          floor = 3, cap = 6, crossDoc = cross)
        val (appN, _) = SpanIndex.appendToSpanIndexWithCensus(app, upd,
          corpus.unionByName(nw), novel, "doc_id", "text", floor = 3,
          cap = 6, crossDoc = cross, rebuildFraction = 10.0)
        assert(indexSet(appN) === indexSet(fullN), s"cross=$cross novel")
        idx.unpersist()
      }
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(base).iterator().asScala.toSeq
        .reverse.foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

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

  test("store append: merged bloom covers every appended gram") {
    // ADVICE r15 (high): the bloom was merged AFTER the store mutation,
    // and Spark's recacheByPath recomputed the persisted delta against
    // the already-mutated members store — the recomputed delta came
    // back EMPTY and the OLD bloom was silently written back, so later
    // chained batches bloom-rejected grams that really exist in the
    // store and dropped their duplicate spans. The merge now runs from
    // a staged pre-mutation snapshot and lands before any store write.
    val base = java.nio.file.Files.createTempDirectory("graft_cenbl_")
    try {
      val cenPath = base.resolve("cen").toString
      val old = docs(
        (1L, "a b c d e f"), (2L, "a b c d e g"), (3L, "h i j k"))
      val (idx0, cen0) = SpanIndex.buildDuplicateSpanIndexWithCensus(
        old, "doc_id", "text", floor = 2, cap = 4)
      idx0.persist()
      SpanIndex.writeSpanCensus(cen0, cenPath, buckets = 4)
      // batch 1: NOVEL vocabulary — zero overlap with the stored bloom,
      // the exact shape whose delta the pre-fix recompute lost
      val b1 = docs((10L, "n1 n2 n3 n4 n5"))
      val cenS = SpanIndex.readSpanCensus(spark, cenPath)
      val (idxA, _) = SpanIndex.appendToSpanIndexWithCensus(idx0, cenS,
        old, b1, "doc_id", "text", floor = 2, cap = 4,
        rebuildFraction = 10.0)
      idxA.persist().count()
      val cen1 = SpanIndex.appendSpanCensusStore(spark, cenPath, b1,
        "doc_id", "text", floor = 2)
      // the STORED bloom must cover EVERY gram hash now in the store —
      // the no-false-negative invariant, asserted against the store
      // itself rather than the returned census
      val bloomRow = spark.read.parquet(s"$cenPath/bloom").collect().head
      val bf = org.apache.spark.util.sketch.BloomFilter.readFrom(
        new java.io.ByteArrayInputStream(
          bloomRow.getAs[Array[Byte]]("__bloom")))
      val storedHashes = spark.read.parquet(s"$cenPath/grams")
        .select($"__fh").distinct().as[Long].collect()
      assert(storedHashes.nonEmpty)
      storedHashes.foreach(h => assert(bf.mightContainLong(h),
        s"stored bloom misses stored gram hash $h"))
      // batch 2 repeats batch 1's novel text ONCE: its spans exist only
      // because the store really contains batch 1's grams — a reverted
      // bloom rejects them at the probe and silently drops the spans
      val b2 = docs((20L, "n1 n2 n3 n4 n5"))
      val (idxB, _) = SpanIndex.appendToSpanIndexWithCensus(idxA, cen1,
        old.unionByName(b1), b2, "doc_id", "text", floor = 2, cap = 4,
        rebuildFraction = 10.0)
      val full = SpanIndex.buildDuplicateSpanIndex(
        old.unionByName(b1).unionByName(b2), "doc_id", "text",
        floor = 2, cap = 4)
      assert(indexSet(idxB) === indexSet(full))
      idx0.unpersist(); idxA.unpersist()
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(base).iterator().asScala.toSeq
        .reverse.foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  test("store append cannot retroactively change earlier lineage") {
    // ADVICE r15 (medium): a census read as a live directory scan let a
    // later appendSpanCensusStore change an UNMATERIALIZED index's
    // lineage — the dense probe re-read the store post-mutation and
    // counted the batch's own appended rows as old corpus, emitting
    // spurious spans. readSpanCensus now pins concrete file lists, so
    // frames derived from a census are immune to later store appends.
    val base = java.nio.file.Files.createTempDirectory("graft_cenpin_")
    try {
      val cenPath = base.resolve("cen").toString
      // overlapping vocabulary + 2 buckets: the batch's survivors land
      // in both buckets, forcing the DENSE fallback that lazily reads
      // the whole grams store (the unshielded path)
      val old = docs((1L, "a b c d e"), (2L, "a b c f g"),
        (3L, "c d e h i"))
      val (idx0, cen0) = SpanIndex.buildDuplicateSpanIndexWithCensus(
        old, "doc_id", "text", floor = 2, cap = 4)
      idx0.persist()
      SpanIndex.writeSpanCensus(cen0, cenPath, buckets = 2)
      val cen = SpanIndex.readSpanCensus(spark, cenPath)
      val beforeMembers = cen.members.count()
      val beforeGrams = cen.grams.count()
      val b1 = docs((10L, "a b c d x"))
      // the returned index is deliberately NOT materialized before the
      // store mutates — the gate pattern (persist is lazy)
      val (idx1, _) = SpanIndex.appendToSpanIndexWithCensus(idx0, cen,
        old, b1, "doc_id", "text", floor = 2, cap = 4,
        rebuildFraction = 10.0)
      SpanIndex.appendSpanCensusStore(spark, cenPath, b1,
        "doc_id", "text", floor = 2)
      // snapshot semantics: the census read before the append still
      // reads the pre-append store
      assert(cen.members.count() === beforeMembers)
      assert(cen.grams.count() === beforeGrams)
      // and the deferred index evaluates to the exact rebuild
      val full = SpanIndex.buildDuplicateSpanIndex(old.unionByName(b1),
        "doc_id", "text", floor = 2, cap = 4)
      assert(indexSet(idx1) === indexSet(full))
      idx0.unpersist()
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(base).iterator().asScala.toSeq
        .reverse.foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  test("auto bucket sizing and same-path compaction") {
    // VERDICT r15 #1: the 512-directory default must scale DOWN with
    // the store (a toy census pays the fan-out's fixed listing tax with
    // zero pruning gain), and a chained census must compact back to its
    // OWN path safely (ADVICE r15 low: overwrite-while-read)
    val base = java.nio.file.Files.createTempDirectory("graft_cencp_")
    try {
      val cenPath = base.resolve("cen").toString
      val cen0 = SpanIndex.buildSpanCensus(corpus, "doc_id", "text", 3)
      SpanIndex.writeSpanCensus(cen0, cenPath) // buckets = auto
      val cen = SpanIndex.readSpanCensus(spark, cenPath)
      // toy store sizes to the auto FLOOR, not the 512-directory cap
      assert(cen.bloom.get.buckets === 8)
      // one chained delta, then COMPACTION: write the store-backed
      // census back to its own path — staging materializes every
      // self-read input before the overwrite deletes its files
      val b1 = docs((90L, "k1 k2 k3 k4"))
      val cen1 = SpanIndex.appendSpanCensusStore(spark, cenPath, b1,
        "doc_id", "text", floor = 3)
      SpanIndex.writeSpanCensus(cen1, cenPath)
      val cen2 = SpanIndex.readSpanCensus(spark, cenPath)
      val fresh = SpanIndex.buildSpanCensus(corpus.unionByName(b1),
        "doc_id", "text", 3)
      assert(censusCounts(cen2) === censusCounts(fresh))
      assert(groupSets(cen2) === groupSets(fresh))
      assert(cen2.counts.nonEmpty && cen2.gramsByBucket.nonEmpty &&
        cen2.bloom.nonEmpty)
      // both staging dirs are cleaned up after their operations
      assert(!java.nio.file.Files.exists(
        base.resolve("cen").resolve("_staging_write")))
      assert(!java.nio.file.Files.exists(
        base.resolve("cen").resolve("_staging_append")))
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(base).iterator().asScala.toSeq
        .reverse.foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  test("census staleness guards refuse covered-corpus drift") {
    // ADVICE r14: a census that no longer matches oldDocs would produce
    // an index that LOOKS exact while missing duplicates — every drift
    // direction must refuse up front (coverage, count, stored counts)
    val (idx, cen) = SpanIndex.buildDuplicateSpanIndexWithCensus(corpus,
      "doc_id", "text", floor = 3, cap = 6)
    val nw = docs((90L, "g1 g2 g3"))
    val grown = corpus.unionByName(docs((99L, "extra doc here")))
    val e1 = intercept[IllegalArgumentException] {
      SpanIndex.appendToSpanIndexWithCensus(idx, cen, grown, nw,
        "doc_id", "text", floor = 3, cap = 6, rebuildFraction = 10.0)
    }
    assert(e1.getMessage.contains("STALE"))
    val shrunk = corpus.filter($"doc_id" =!= 1L)
    val e2 = intercept[IllegalArgumentException] {
      SpanIndex.appendToSpanIndexWithCensus(idx, cen, shrunk, nw,
        "doc_id", "text", floor = 3, cap = 6, rebuildFraction = 10.0)
    }
    assert(e2.getMessage.contains("STALE"))
    val bad = cen.copy(counts = Some(cen.members.groupBy($"__gid")
      .agg((count(lit(1)) + 1).as("__mo"))))
    val e3 = intercept[IllegalArgumentException] {
      SpanIndex.appendToSpanIndexWithCensus(idx, bad, corpus, nw,
        "doc_id", "text", floor = 3, cap = 6, rebuildFraction = 10.0)
    }
    assert(e3.getMessage.contains("counts"))
  }

  test("append at minDocs = 3 == full rebuild over the union") {
    val rnd = new scala.util.Random(9)
    for (trial <- 1 to 2) {
      val base = (1 to 22).map { i =>
        val n = rnd.nextInt(22)
        (i.toLong, Seq.fill(n)("t" + rnd.nextInt(6)).mkString(" "))
      }
      val copies = base.take(4).map { case (id, t) => (id + 1000L, t) }
      val all = base ++ copies
      val (oldRows, newRows) = all.partition(_._1 % 5 != 0)
      val old = docs(oldRows: _*)
      val nw = docs(newRows: _*)
      val idx0 = SpanIndex.buildDuplicateSpanIndex(old, "doc_id", "text",
        floor = 2, cap = 4, crossDoc = true, minDocs = 3)
      idx0.persist()
      val full = SpanIndex.buildDuplicateSpanIndex(docs(all: _*), "doc_id",
        "text", floor = 2, cap = 4, crossDoc = true, minDocs = 3)
      val app = SpanIndex.appendToSpanIndex(idx0, old, nw, "doc_id",
        "text", floor = 2, cap = 4, crossDoc = true, minDocs = 3,
        rebuildFraction = 10.0) // force the incremental path
      assert(indexSet(app) === indexSet(full), s"trial $trial")
      idx0.unpersist()
    }
  }

  test("r16 regroup arms equal: single-exchange == two-exchange, build and append") {
    // the r16 single-exchange pair regroup (regroupPairs) must compute
    // EXACTLY the historical two-exchange chain, on the build AND on the
    // append path (which also exercises the pass-through merge: docs the
    // delta never touches must come out byte-identical to their stored
    // rows); both arms must equal the rebuild over the union
    def withArm[A](arm: Boolean)(body: => A): A = {
      spark.conf.set("graft.regroupSingleExchange", arm.toString)
      try body
      finally spark.conf.unset("graft.regroupSingleExchange")
    }
    def build(df: DataFrame) = SpanIndex.buildDuplicateSpanIndex(df,
      "doc_id", "text", floor = 3, cap = 6)
    val bArms = Seq(true, false).map(a => withArm(a)(indexSet(build(corpus))))
    assert(bArms(0) === bArms(1), "build arms diverge")
    val old = corpus.filter($"doc_id" =!= 2L)
    val nw = corpus.filter($"doc_id" === 2L)
    val aArms = Seq(true, false).map { a =>
      withArm(a) {
        val idx0 = build(old)
        idx0.persist()
        val r = indexSet(SpanIndex.appendToSpanIndex(idx0, old, nw,
          "doc_id", "text", floor = 3, cap = 6, rebuildFraction = 1000.0))
        idx0.unpersist()
        r
      }
    }
    assert(aArms(0) === aArms(1), "append arms diverge")
    assert(aArms(0) === bArms(0), "append != rebuild over the union")
  }
}
