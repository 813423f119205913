package graft

import org.apache.spark.sql.functions._

import graft.functions.Corpus

class CorpusSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    spark.createDataset(rows.toSeq).toDF("doc_id", "text")

  test("contaminatedDocs finds exactly the docs sharing an n-gram") {
    val train = docs(
      (1L, "a b c d e f"), // shares the 3-gram "b c d" with bench
      (2L, "x y z w v u"), // no overlap
      (3L, "c d e b c d")) // shares "b c d" and "c d e"
    val bench = docs((100L, "q b c d e r"))
    val got = Corpus.contaminatedDocs(train, "doc_id", "text", bench, "text", n = 3)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 2L, 3L -> 2L)) // "b c d" + "c d e" each
  }

  test("contaminatedDocsBloom is exact for any fpp (bloom is only a prefilter)") {
    val train = docs(
      (1L, "a b c d e f"),
      (2L, "x y z w v u"),
      (3L, "c d e b c d"),
      (4L, "p q r s t u v w"))
    val bench = docs((100L, "q b c d e r"), (101L, "s t u v z z"))
    val exact = Corpus.contaminatedDocs(train, "doc_id", "text", bench, "text", n = 3)
      .as[(Long, Long)].collect().toMap
    for (fpp <- Seq(0.01, 0.5)) { // even a sieve-grade filter must not change the answer
      val got = Corpus.contaminatedDocsBloom(train, "doc_id", "text",
        bench, "text", n = 3, fpp = fpp).as[(Long, Long)].collect().toMap
      assert(got === exact, s"fpp=$fpp")
    }
  }

  test("line boilerplate: planted repeated lines found, scrub preserves order") {
    // 5 docs share the header line, 3 the footer; bodies are unique;
    // doc 6 is ONLY boilerplate; doc 7 has blank lines and no boilerplate
    val header = "nav home about"
    val footer = "copyright footer"
    val df = docs(
      (1L, s"$header\nbody one alpha\nbody one beta\n$footer"),
      (2L, s"$header\nbody two alpha\n$footer"),
      (3L, s"$header\nbody three\n\n$footer"), // blank line dropped
      (4L, s"$header\nbody four"),
      (5L, s"$header\nbody five"),
      (6L, s"$header"),
      (7L, "lonely body\n\n  \nlast line"))
    val boiler = Corpus.boilerplateLines(df, "doc_id", "text", minDocs = 3)
      .as[(String, Long)].collect().toMap
    assert(boiler === Map(header -> 6L, footer -> 3L))
    val scrub = Corpus.scrubBoilerplateLines(df, "doc_id", "text", minDocs = 3)
      .select($"doc_id", $"n_segments", $"n_dropped", $"clean_text")
      .as[(Long, Long, Long, String)].collect().map(r => r._1 -> r).toMap
    assert(scrub(1L) === ((1L, 4L, 2L, "body one alpha\nbody one beta")))
    assert(scrub(3L) === ((3L, 3L, 2L, "body three"))) // blank line not a segment
    assert(scrub(6L) === ((6L, 1L, 1L, ""))) // all-boilerplate doc survives empty
    assert(scrub(7L) === ((7L, 2L, 0L, "lonely body\nlast line")))
    assert(scrub.size === 7)
    // line segmentation is a pure map: no exchange in the segment plan
    val segPlan = Corpus.lineSegments(df, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!segPlan.contains("Exchange"), segPlan)
  }

  test("sentence boilerplate: [.!?]+\\s+ split, repeated sentence found") {
    val df = docs(
      (1L, "Buy our product now. Unique body one! Call today."),
      (2L, "Buy our product now. Unique body two? Call today."),
      (3L, "Buy our product now. Unique body three. Call today."),
      (4L, "Only unique things here. Nothing repeats"))
    val segs = Corpus.sentenceSegments(df, "doc_id", "text")
      .filter($"doc_id" === 1L).select($"chunk_text").as[String].collect()
    assert(segs.toSeq === Seq("Buy our product now", "Unique body one",
      "Call today.")) // terminal run of the LAST sentence survives
    val boiler = Corpus.boilerplateSentences(df, "doc_id", "text", minDocs = 3)
      .as[(String, Long)].collect().toMap
    assert(boiler === Map("Buy our product now" -> 3L, "Call today." -> 3L))
    val scrub = Corpus.scrubBoilerplateSentences(df, "doc_id", "text", minDocs = 3)
      .select($"doc_id", $"n_dropped", $"clean_text")
      .as[(Long, Long, String)].collect().map(r => r._1 -> r).toMap
    assert(scrub(1L) === ((1L, 2L, "Unique body one")))
    assert(scrub(4L) === ((4L, 0L, "Only unique things here. Nothing repeats")))
  }

  test("normalized line scrub: digit-variant boilerplate collapses, output verbatim") {
    val df = docs(
      (1L, "body one\npage 1 of 99"),
      (2L, "body two\npage 2 of 99"),
      (3L, "body three\npage 3 of 99"),
      (4L, "body four")) // no footer
    val norm = (c: org.apache.spark.sql.Column) =>
      regexp_replace(lower(c), "[0-9]+", "0")
    // verbatim matching: each footer is a singleton, nothing drops
    val verbatim = Corpus.scrubBoilerplateLines(df, "doc_id", "text", minDocs = 3)
      .agg(sum($"n_dropped")).as[Long].head()
    assert(verbatim === 0L)
    // normalized matching: all three footers collapse to one key and drop;
    // kept lines are the ORIGINAL text
    val got = Corpus.scrubBoilerplateLinesNormalized(df, "doc_id", "text",
        minDocs = 3, normalize = norm)
      .select($"doc_id", $"n_dropped", $"clean_text")
      .as[(Long, Long, String)].collect().map(r => r._1 -> r).toMap
    assert(got(1L) === ((1L, 1L, "body one")))
    assert(got(2L) === ((2L, 1L, "body two")))
    assert(got(4L) === ((4L, 0L, "body four")))
  }

  test("maskDuplicateSpans: shared spans removed token-exact, unique text kept") {
    // docs 1 and 2 share the 3-gram span "q w e" (extended to "q w e r" in
    // doc 1 via two overlapping hits); doc 3 is untouched; doc 4 is
    // entirely one shared span; doc 5 is empty
    val df = docs(
      (1L, "a b q w e r c"), // grams "q w e","w e r": dup? "w e r" only in 1
      (2L, "x q w e y"),
      (3L, "m n o p"),
      (4L, "q w e"),
      (5L, ""))
    val got = Corpus.maskDuplicateSpans(df, "doc_id", "text", n = 3, minDocs = 2)
      .select($"doc_id", $"n_tokens", $"n_masked", $"clean_text")
      .as[(Long, Long, Long, String)].collect().map(r => r._1 -> r).toMap
    // dup 3-grams at minDocs=2: "q w e" (docs 1,2,4)
    assert(got(1L) === ((1L, 7L, 3L, "a b r c")))
    assert(got(2L) === ((2L, 5L, 3L, "x y")))
    assert(got(3L) === ((3L, 4L, 0L, "m n o p")))
    assert(got(4L) === ((4L, 3L, 3L, ""))) // fully-duplicated doc -> empty
    assert(got(5L) === ((5L, 0L, 0L, "")))
    assert(got.size === 5)
    // overlapping hits union their covered positions, not double count:
    // doc A repeats the span twice with overlap against B
    val df2 = docs((1L, "q w e q w e"), (2L, "q w e"))
    val got2 = Corpus.maskDuplicateSpans(df2, "doc_id", "text", 3, 2)
      .select($"doc_id", $"n_masked").as[(Long, Long)].collect().toMap
    assert(got2 === Map(1L -> 6L, 2L -> 3L))
    // broadcastDups=Some(false) degradation path: identical result
    val got3 = Corpus.maskDuplicateSpans(df, "doc_id", "text", 3, 2,
        broadcastDups = Some(false))
      .select($"doc_id", $"n_tokens", $"n_masked", $"clean_text")
      .as[(Long, Long, Long, String)].collect().map(r => r._1 -> r).toMap
    assert(got3 === got)
  }

  test("duplicateSpanIntervals: maximal variable-length spans; occurrence vs doc census") {
    // docs 1,2 share a 5-token span at different offsets; minLen=3 finds
    // it at its true 5-token extent (one maximal run, not 3-token bits)
    val df = docs(
      (1L, "a b q w e r t c"),
      (2L, "x q w e r t y"),
      (3L, "m n o p"))
    val got = Corpus.duplicateSpanIntervals(df, "doc_id", "text",
        minLen = 3, minCount = 2)
      .as[(Long, Int, Int, Int, String)].collect().toSet
    assert(got === Set(
      (1L, 3, 7, 5, "q w e r t"),
      (2L, 2, 6, 5, "q w e r t")))
    // WITHIN-DOC repeat of a doc-unique phrase: total-occurrence census
    // (the Lee et al. counting) masks both copies — adjacent copies merge
    // into one maximal run; distinct-doc census sees count 1 and stays
    // silent
    val rep = docs((1L, "u v w u v w"), (2L, "unrelated words here now"))
    val occGot = Corpus.duplicateSpanIntervals(rep, "doc_id", "text", 3, 2,
        countOccurrences = true)
      .as[(Long, Int, Int, Int, String)].collect().toSet
    assert(occGot === Set((1L, 1, 6, 6, "u v w u v w")))
    val docGot = Corpus.duplicateSpanIntervals(rep, "doc_id", "text", 3, 2,
        countOccurrences = false).collect()
    assert(docGot.isEmpty)
    // two DISJOINT shared spans in one doc stay two rows
    val two = docs(
      (1L, "q w e 1a 1b 1c r t y"),
      (2L, "q w e 2a 2b r t y"))
    val twoGot = Corpus.duplicateSpanIntervals(two, "doc_id", "text", 3, 2)
      .as[(Long, Int, Int, Int, String)].collect().toSet
    assert(twoGot === Set(
      (1L, 1, 3, 3, "q w e"), (1L, 7, 9, 3, "r t y"),
      (2L, 1, 3, 3, "q w e"), (2L, 6, 8, 3, "r t y")))
    // occurrence-counted masking variant agrees with the interval union
    val m = Corpus.maskDuplicateSpans(rep, "doc_id", "text", 3, 2,
        countOccurrences = true)
      .select($"doc_id", $"n_masked", $"clean_text")
      .as[(Long, Long, String)].collect()
      .map { case (a, b, c) => a -> ((b, c)) }.toMap
    assert(m(1L) === ((6L, "")))
    assert(m(2L) === ((0L, "unrelated words here now")))
  }

  test("maskDuplicateSpans: dup-set broadcast auto-selected from input size") {
    // the dup-set marking join is the LeftSemi node; the outer mask join
    // broadcasts legitimately at toy scale, so asserts scope to that line
    def semiLines(df: org.apache.spark.sql.DataFrame): String =
      df.queryExecution.executedPlan.toString
        .linesIterator.filter(_.contains("LeftSemi")).mkString("\n")
    // small input (known-small plan stats): auto mode broadcasts the
    // dup-gram set — the marking semi-join is map-side
    val small = docs((1L, "q w e a"), (2L, "q w e b"))
    val smallSemi = semiLines(Corpus.maskDuplicateSpans(small, "doc_id", "text", 3, 2))
    assert(smallSemi.contains("BroadcastHashJoin"),
      s"small input should broadcast the dup set:\n$smallSemi")
    // forced-oversized input: spark.range's plan stats are size-estimated
    // (never materialized) and exceed BroadcastDupsMaxInputBytes, so auto
    // mode must refuse the driver broadcast and shuffle the semi-join
    val rows = 2L * Corpus.BroadcastDupsMaxInputBytes / 8 // 8 bytes/row est.
    val big = spark.range(rows)
      .select(col("id").as("doc_id"), lit("q w e r t y u i o p").as("text"))
    assert(big.queryExecution.optimizedPlan.stats.sizeInBytes >
      Corpus.BroadcastDupsMaxInputBytes)
    val bigSemi = semiLines(Corpus.maskDuplicateSpans(big, "doc_id", "text", 3, 2))
    assert(bigSemi.nonEmpty && !bigSemi.contains("Broadcast"),
      s"oversized input must not broadcast the dup set:\n$bigSemi")
    // explicit override still wins over auto
    val forcedSemi = semiLines(Corpus.maskDuplicateSpans(small, "doc_id", "text", 3, 2,
      broadcastDups = Some(false)))
    assert(forcedSemi.contains("ShuffledHashJoin"), forcedSemi)
  }

  test("contaminatedDocsBloom plan: bloom prefilter below the verify join") {
    val train = docs((1L, "a b c d e f"))
    val bench = docs((100L, "q b c d e r"))
    val plan = Corpus.contaminatedDocsBloom(train, "doc_id", "text",
      bench, "text", n = 3).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    // the mightContain filter must run map-side on the train scan, BEFORE
    // any join operator — that is the entire point of the bloom pass.
    // (Whether the verify join itself broadcasts is Catalyst's size-stats
    // call: tiny test inputs broadcast; a 100 TB bench side would not.)
    val filterAt = plan.indexOf("Filter (UDF(gram")
    val joinAt = plan.indexOf("Join")
    assert(filterAt >= 0, "bloom prefilter missing from plan")
    assert(joinAt >= 0 && filterAt > joinAt, // deeper in the tree = later in text
      "bloom prefilter must be a child of the verify join")
  }

  test("weightedSample: matches the A-Res formula locally, biased to weight") {
    val rows = (0L until 300L).map(i => (i, (i % 7) * 100 + 1))
    val df = rows.toDF("doc_id", "w")
    def score(id: Long, w: Long, seed: Long): Double = {
      val p = 1000000007L
      val h1 = (((id + seed) % p) * 2654435761L) % p
      val h = (h1 * h1) % p
      math.pow((h + 1).toDouble / 1000000008.0, 1.0 / w)
    }
    val expected = rows.map { case (id, w) => (score(id, w, 17L), id) }
      .sortBy { case (s, id) => (-s, id) }.take(40).map(_._2).toSet
    val got = Corpus.weightedSample(df, "doc_id", col("w"), k = 40, seed = 17L)
      .select("doc_id").as[Long].collect()
    assert(got.toSet === expected)
    // determinism + bias: across seeds, the max-weight stratum (w=601)
    // must be sampled far above its 1/7 row share
    val hi = (1 to 20).map { s =>
      Corpus.weightedSample(df, "doc_id", col("w"), k = 40, seed = s.toLong)
        .filter($"w" === 601).count()
    }
    // weight share of the w=601 stratum is ~28.5%; require well above the
    // 1/7 uniform share AND real seed-to-seed variation (the affine-seed
    // bug produced identical counts for every seed)
    assert(hi.sum.toDouble / (20 * 40) > 0.2, s"weight bias too weak: $hi")
    assert(hi.distinct.size > 1, s"selection is seed-invariant: $hi")
    val plan = Corpus.weightedSample(df, "doc_id", col("w"), k = 40, seed = 1L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), "selection must be top-k, not a full sort")
  }

  test("contaminatedDocs ignores sub-n overlaps") {
    val train = docs((1L, "a b x c d y"))
    val bench = docs((100L, "a b c d"))
    val got = Corpus.contaminatedDocs(train, "doc_id", "text", bench, "text", n = 3)
    assert(got.count() === 0L)
  }

  test("heavyHitters counts and deterministic tie-break") {
    val df = docs((1L, "b a a"), (2L, "c b a"), (3L, "d c"))
    val got = Corpus.heavyHitters(df, "text", 3).as[(String, Long)].collect().toSeq
    assert(got === Seq(("a", 3L), ("b", 2L), ("c", 2L)))
  }

  test("scrubPii: order URL -> email -> IP -> long digits") {
    val raw = "mail bob@x.org link https://x.org/a?u=1 host 10.1.2.3 acct 123456789 ok 42"
    val got = docs((1L, raw)).select(Corpus.scrubPii($"text")).as[String].head()
    assert(got === "mail <EMAIL> link <URL> host <IP> acct <NUM> ok 42")
    // an email inside a URL is redacted as part of the URL
    val inUrl = docs((1L, "see https://x.org/u?mail=bob@x.org end"))
      .select(Corpus.scrubPii($"text")).as[String].head()
    assert(inUrl === "see <URL> end")
  }

  test("countRe counts non-overlapping matches") {
    val df = docs((1L, "a@b.com c@d.org nope 1234567 12"))
    val (ne, nn) = df.select(
      Corpus.countRe($"text", Corpus.emailRe),
      Corpus.countRe($"text", Corpus.longNumRe)).as[(Long, Long)].head()
    assert(ne === 2L && nn === 1L)
  }

  test("stratifiedSample: exactly k per stratum, deterministic") {
    val df = spark.createDataset(
      (0L until 40L).map(i => (i, s"s${i % 4}", s"text body $i"))
    ).toDF("doc_id", "stratum", "text")
    val got = Corpus.stratifiedSample(df, "stratum", k = 3, orderCol = "text",
      idCol = "doc_id")
    assert(got.groupBy($"stratum").count().as[(String, Long)].collect()
      .forall(_._2 === 3L))
    val again = Corpus.stratifiedSample(df, "stratum", k = 3, orderCol = "text",
      idCol = "doc_id").select($"doc_id").as[Long].collect().sorted
    assert(got.select($"doc_id").as[Long].collect().sorted === again)
  }

  test("stratifiedSample: heap path == window-sort path, rn included") {
    val df = spark.createDataset(
      (0L until 50L).map(i => (i, s"s${i % 5}", s"body $i"))
    ).toDF("doc_id", "stratum", "text").repartition(7)
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.select($"stratum", $"rn", $"doc_id").as[(String, Int, Long)]
        .collect().toSet
    val heap = Corpus.stratifiedSample(df, "stratum", k = 4,
      orderCol = "text", idCol = "doc_id")
    val sort = Corpus.stratifiedSampleSort(df, "stratum", k = 4,
      orderCol = "text", idCol = "doc_id")
    assert(rows(heap) === rows(sort))
    // k larger than the stratum: both keep every row
    assert(rows(Corpus.stratifiedSample(df, "stratum", 99, "text", "doc_id"))
      === rows(Corpus.stratifiedSampleSort(df, "stratum", 99, "text", "doc_id")))
  }

  test("stratifiedSample null semantics: null order texts and a null " +
      "stratum sample identically on both paths; null ids drop from heap") {
    // null texts rank as md5('') on BOTH paths (not dropped, not
    // nulls-first); the null stratum is a regular stratum (heap group-by
    // keeps it, join-back is null-safe, window partitions on it)
    val rowsIn: Seq[(java.lang.Long, String, String)] =
      (0L until 30L).map(i => (java.lang.Long.valueOf(i),
        if (i % 3 == 0) null else s"s${i % 2}",
        if (i % 5 == 0) null else s"body $i"))
    val df = spark.createDataset(rowsIn).toDF("doc_id", "stratum", "text")
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.select($"stratum", $"rn", $"doc_id").as[(String, Int, Long)]
        .collect().toSet
    val heap = Corpus.stratifiedSample(df, "stratum", k = 4,
      orderCol = "text", idCol = "doc_id")
    val sort = Corpus.stratifiedSampleSort(df, "stratum", k = 4,
      orderCol = "text", idCol = "doc_id")
    assert(rows(heap) === rows(sort))
    assert(heap.filter($"stratum".isNull).count() === 4)
    // documented divergence: a NULL id is dropped by the heap path
    // (primitive-long carrier) but ranked by the window path
    val withNullId = spark.createDataset(
      rowsIn :+ ((null: java.lang.Long, "s0", "aaaa"))
    ).toDF("doc_id", "stratum", "text")
    val h2 = Corpus.stratifiedSample(withNullId, "stratum", 99, "text", "doc_id")
    val s2 = Corpus.stratifiedSampleSort(withNullId, "stratum", 99, "text", "doc_id")
    assert(h2.filter($"doc_id".isNull).count() === 0)
    assert(s2.filter($"doc_id".isNull).count() === 1)
    assert(h2.count() === s2.count() - 1)
  }

  test("mixtureSample rejects a null domain with a clear error") {
    val df = spark.createDataset(Seq(
      (1L, "a", "t1"), (2L, null: String, "t2"), (3L, "b", "t3")
    )).toDF("doc_id", "source", "text")
    val e = intercept[IllegalArgumentException] {
      Corpus.mixtureSample(df, "doc_id", "source", totalK = 2,
        alpha = 0.5, orderCol = "text")
    }
    assert(e.getMessage.contains("null source domain"))
  }

  test("stratifiedSample plan: no window/sort of the corpus, heap aggregate") {
    val df = spark.createDataset(
      (0L until 30L).map(i => (i, s"s${i % 3}", s"body $i"))
    ).toDF("doc_id", "stratum", "text")
    val plan = Corpus.stratifiedSample(df, "stratum", k = 2,
      orderCol = "text", idCol = "doc_id").queryExecution.executedPlan
    val s = plan.toString
    assert(!s.contains("Window"), s"no window sort allowed, plan was:\n$s")
    assert(plan.collectWithSubqueries {
      case x: org.apache.spark.sql.execution.SortExec => x }.isEmpty,
      s"no SortExec allowed, plan was:\n$s")
    assert(s.contains("ObjectHashAggregate"),
      s"bounded-heap aggregate expected, plan was:\n$s")
  }

  test("contaminatedDocs plan: benchmark side broadcast, no cross join") {
    val train = docs((1L, "a b c d e f"), (2L, "x y z w v u"))
    val bench = docs((100L, "q b c d e r"))
    val plan = Corpus.contaminatedDocs(train, "doc_id", "text", bench, "text", n = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"bench side should broadcast, plan was:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"no cross product allowed, plan was:\n$plan")
  }

  test("contaminatedDocs with broadcastBench=false: same result, shuffled join") {
    val train = docs((1L, "a b c d e f"), (2L, "x y z w v u"), (3L, "c d e b c d"))
    val bench = docs((100L, "q b c d e r"))
    val shuffled = Corpus.contaminatedDocs(train, "doc_id", "text", bench, "text",
      n = 3, broadcastBench = false)
    assert(shuffled.as[(Long, Long)].collect().toMap === Map(1L -> 2L, 3L -> 2L))
  }

  test("heavyHitters plan: TakeOrdered, not a global sort") {
    val df = docs((1L, "b a a"), (2L, "c b a"))
    val plan = Corpus.heavyHitters(df, "text", 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k should use TakeOrderedAndProject, plan was:\n$plan")
  }

  test("termStats: tf/df/N and smoothed tfidf match the in-memory reference") {
    val df = docs(
      (1L, "apple banana apple"),
      (2L, "banana cherry"),
      (3L, "apple"))
    val got = Corpus.termStats(df, "doc_id", "text")
      .select($"doc_id", $"term", $"tf", $"doc_freq", $"n_docs", $"tfidf")
      .as[(Long, String, Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    def ref(tf: Long, dfq: Long) = tf * (math.log(4.0 / (dfq + 1)) + 1.0)
    assert(got((1L, "apple"))._3 === 2L)
    assert(got((1L, "apple"))._4 === 2L) // in docs 1 and 3
    assert(got((2L, "cherry"))._4 === 1L)
    assert(got.values.forall(_._5 === 3L))
    got.values.foreach { case (_, _, tf, dfq, _, tfidf) =>
      assert(math.abs(tfidf - ref(tf, dfq)) < 1e-12)
    }
    // rare term outranks common term at equal tf
    assert(got((2L, "cherry"))._6 > got((2L, "banana"))._6)
  }

  test("chunkDocs: window/stride coverage, remainder, empty doc") {
    val toks = (1 to 80).map(i => s"t$i")
    val df = docs((1L, toks.mkString(" ")), (2L, "a b"), (3L, ""))
    val got = Corpus.chunkDocs(df, "doc_id", "text", window = 32, stride = 24)
      .as[(Long, Int, String, Long)].collect().sortBy(r => (r._1, r._2))
    val d1 = got.filter(_._1 == 1L)
    // 80 tokens -> chunks at 0, 24, 48 -> ceil((80-32)/24)+1 = 3
    assert(d1.map(_._2).toSeq === Seq(0, 1, 2))
    assert(d1(0)._3 === toks.slice(0, 32).mkString(" "))
    assert(d1(1)._3 === toks.slice(24, 56).mkString(" "))
    assert(d1(2)._3 === toks.slice(48, 80).mkString(" ") && d1(2)._4 === 32L)
    // every token is covered by at least one chunk
    assert(d1.flatMap(_._3.split(" ")).toSet === toks.toSet)
    // short doc: one whole chunk; empty doc: no chunks
    assert(got.filter(_._1 == 2L).toSeq === Seq((2L, 0, "a b", 2L)))
    assert(!got.exists(_._1 == 3L))
    // trailing remainder shorter than window
    val rem = Corpus.chunkDocs(docs((9L, (1 to 40).map("x" + _).mkString(" "))),
      "doc_id", "text", 32, 24).as[(Long, Int, String, Long)].collect()
    assert(rem.map(_._4).toSeq.sorted === Seq(16L, 32L))
  }

  test("bm25Stats matches the in-memory Robertson reference") {
    val df = docs(
      (1L, "apple banana apple cherry"),
      (2L, "banana banana"),
      (3L, "apple date"))
    val got = Corpus.bm25Stats(df, "doc_id", "text")
      .select($"doc_id", $"term", $"tf", $"dl", $"doc_freq", $"n_docs",
        $"sum_dl", $"bm25")
      .as[(Long, String, Long, Long, Long, Long, Long, Double)].collect()
    assert(got.forall(r => r._6 === 3L && r._7 === 8L))
    def ref(tf: Long, dl: Long, dfq: Long): Double = {
      val avgdl = 8.0 / 3.0
      val idf = math.log((3.0 - dfq + 0.5) / (dfq + 0.5) + 1.0)
      idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
    }
    got.foreach { case (_, _, tf, dl, dfq, _, _, bm25) =>
      assert(math.abs(bm25 - ref(tf, dl, dfq)) < 1e-12)
    }
    // the term appearing in every doc scores below a same-tf rare term
    val byKey = got.map(r => (r._1, r._2) -> r._8).toMap
    assert(byKey((3L, "date")) > byKey((3L, "apple")))
  }

  test("corpusDiff: added, removed, changed, unchanged filtered out") {
    val oldSnap = docs((1L, "same text"), (2L, "will change"), (3L, "will vanish"))
    val newSnap = docs((1L, "same text"), (2L, "has changed"), (4L, "brand new"))
    val got = Corpus.corpusDiff(oldSnap, newSnap, "doc_id", "text")
      .as[(Long, String)].collect().sortBy(_._1)
    assert(got.toSeq === Seq((2L, "changed"), (3L, "removed"), (4L, "added")))
    // fingerprint-based: formatting-only changes are NOT "changed"
    val formatted = docs((1L, "Same,  TEXT!"))
    val diff2 = Corpus.corpusDiff(docs((1L, "same text")), formatted, "doc_id", "text")
    assert(diff2.count() === 0L)
  }

  test("corpusDiff: null-text documents are present, not added/removed") {
    val withNull = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        org.apache.spark.sql.Row(1L, null), org.apache.spark.sql.Row(2L, "kept"))),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("text",
          org.apache.spark.sql.types.StringType))))
    // null -> text is "changed" (id present in both), not "added"
    val d1 = Corpus.corpusDiff(withNull, docs((1L, "now text"), (2L, "kept")),
      "doc_id", "text").as[(Long, String)].collect().toSeq
    assert(d1 === Seq((1L, "changed")))
    // null -> null is unchanged
    val d2 = Corpus.corpusDiff(withNull, withNull, "doc_id", "text")
    assert(d2.count() === 0L)
  }

  test("repetitionStats: top token fraction, empty doc safe") {
    val df = docs((1L, "a a a b"), (2L, ""), (3L, "x y"))
    val got = Corpus.repetitionStats(df, "doc_id", "text")
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(got(0) === ((1L, 4L, 3L, 0.75)))
    assert(got(1) === ((2L, 0L, 0L, 0.0)))
    assert(got(2) === ((3L, 2L, 1L, 0.5)))
  }

  test("boilerplateSegments: document frequency, per-doc repeats count once") {
    val df = docs(
      (1L, "a b a b"),   // segments "a b", "a b" — counts ONCE for doc 1
      (2L, "a b x"),     // segments "a b", "x"
      (3L, "y z"),       // segment "y z"
      (4L, "x"))         // segment "x"
    val got = Corpus.boilerplateSegments(df, "doc_id", "text",
        segLen = 2, minDocs = 2)
      .as[(String, Long)].collect().toMap
    assert(got === Map("a b" -> 2L, "x" -> 2L))
  }

  test("scrubBoilerplate: drops flagged segments, keeps order; all-boiler " +
      "and empty docs survive") {
    val df = docs(
      (1L, "h h a b c d h h"), // segs: "h h","a b","c d","h h" — h h dropped
      (2L, "h h"),             // all boilerplate -> empty clean text
      (3L, "p q r"),           // untouched: segs "p q","r" unique
      (4L, ""))                // empty doc: zero segments
    val got = Corpus.scrubBoilerplate(df, "doc_id", "text",
        segLen = 2, minDocs = 2)
      .as[(Long, Long, Long, String)].collect().sortBy(_._1)
    assert(got(0) === ((1L, 4L, 2L, "a b c d")))
    assert(got(1) === ((2L, 1L, 1L, "")))
    assert(got(2) === ((3L, 2L, 0L, "p q r")))
    assert(got(3) === ((4L, 0L, 0L, "")))
  }

  test("scrubBoilerplate plan: boilerplate set broadcast, corpus not re-shuffled") {
    val df = docs((1L, "a b c d"), (2L, "a b"), (3L, "z"))
    val plan = Corpus.scrubBoilerplate(df, "doc_id", "text", 2, 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"boilerplate mark should be a broadcast join, plan was:\n$plan")
    assert(!plan.contains("CartesianProduct"))
    // degraded path: same answer without the broadcast
    val a = Corpus.scrubBoilerplate(df, "doc_id", "text", 2, 2)
      .as[(Long, Long, Long, String)].collect().sortBy(_._1).toSeq
    val b = Corpus.scrubBoilerplate(df, "doc_id", "text", 2, 2,
      broadcastBoiler = false)
      .as[(Long, Long, Long, String)].collect().sortBy(_._1).toSeq
    assert(a === b)
  }

  test("bigramLmScore: hand-computed fixed-point terms, unseen path, empty doc") {
    // train: "a b a b c" -> c2("a b")=2, c2("b a")=1, c2("b c")=1;
    // contexts c1(a)=2, c1(b)=2; vocabulary V = {a,b,c} = 3
    val model = Corpus.bigramLm(docs((1L, "a b a b c")), "text")
    val got = Corpus.bigramLmScore(
        docs((10L, "a b x"), (11L, "")), "doc_id", "text", model)
      .select("doc_id", "n_bigrams", "n_unseen", "score_u", "avg_u", "lm_logprob")
      .as[(Long, Long, Long, Long, Long, Double)].collect()
      .sortBy(_._1)
    //  "a b": (2+1)·1e6 div (2+3) = 600000; "b x" unseen: 1e6 div 5 = 200000
    assert(got(0) === ((10L, 2L, 1L, 800000L, 400000L, got(0)._6)))
    assert(math.abs(got(0)._6 - (math.log(3.0 / 5) + math.log(1.0 / 5))) < 1e-12)
    assert(got(1) === ((11L, 0L, 0L, 0L, 0L, 0.0)))
  }

  test("searchTopK ranks docs by summed per-term BM25 (true-ln double agrees)") {
    val df = docs(
      (1L, "spark spark spark hash"), // 'spark' x3 but short doc
      (2L, "spark hash a b c d e f"), // both terms, once each, longer
      (3L, "a b c d e f g h"),        // no query terms
      (4L, "hash hash hash hash"))    // 'hash' only, saturated tf
    val got = Corpus.searchTopK(df, "doc_id", "text", Seq("spark", "hash"), 4)
      .select("doc_id", "n_hit_terms", "bm25")
      .as[(Long, Long, Double)].collect()
    // docs 3 never matches; 1,2,4 do; 2 hits both terms
    assert(got.map(_._1).toSet === Set(1L, 2L, 4L))
    assert(got.find(_._1 == 2L).get._2 === 2L)
    // the integer-surrogate rank must agree with the true-ln BM25 rank on
    // this well-separated fixture (surrogate monotonicity sanity)
    val byU = got.map(_._1).toSeq // already ordered by score_u desc
    val byD = got.sortBy(-_._3).map(_._1).toSeq
    assert(byU === byD)
  }

  test("searchIndex == searchTopK and the scan prunes to the query buckets") {
    val df = docs(
      (1L, "spark hash table scan"),
      (2L, "hash join merge sort"),
      (3L, "window agg group by"),
      (4L, "spark spark window stream"))
    val base = java.nio.file.Files.createTempDirectory("graft_sidx_spec_")
    try {
      val path = base.resolve("idx").toString
      Corpus.searchIndexWrite(df, "doc_id", "text", path, nBuckets = 8)
      val mem = Corpus.searchTopK(df, "doc_id", "text", Seq("spark", "window"), 4)
        .select("doc_id", "n_hit_terms", "score_u")
        .as[(Long, Long, Long)].collect().toSeq
      val idx = Corpus.searchIndex(spark, path, "doc_id",
        Seq("spark", "window"), nBuckets = 8, k = 4)
      val idxRows = idx.select("doc_id", "n_hit_terms", "score_u")
        .as[(Long, Long, Long)].collect().toSeq
      assert(idxRows === mem)
      // static partition pruning: the parquet scan must carry a bucket
      // partition filter, so only the query terms' directories are read
      val plan = idx.queryExecution.executedPlan.toString
      assert(plan.contains("PartitionFilters") && plan.contains("bucket"),
        s"expected bucket partition pruning in plan:\n$plan")
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(base).iterator().asScala.toSeq
        .reverse.foreach(java.nio.file.Files.delete)
    }
  }

  test("duplicateNgramStats: hand-computed bigram/trigram signals") {
    val df = docs((1L, "a b a b a"), (2L, "x y z"), (3L, "q"), (4L, ""))
    val got = Corpus.duplicateNgramStats(df, "doc_id", "text", ns = Seq(2, 3))
      .orderBy("doc_id", "n")
      .as[(Long, Int, Long, Long, Long, Double, Long)].collect().toSeq
    assert(got === Seq(
      // "a b a b a": bigrams (a b)x2 (b a)x2 -> all 4 duplicated;
      // trigrams (a b a)x2 (b a b)x1 -> 2 of 3 duplicated
      (1L, 2, 5L, 4L, 4L, 1.0, 2L),
      (1L, 3, 5L, 3L, 2L, 0.6667, 2L),
      (2L, 2, 3L, 2L, 0L, 0.0, 1L),
      (2L, 3, 3L, 1L, 0L, 0.0, 1L),
      (3L, 2, 1L, 0L, 0L, 0.0, 0L), // too short for any bigram
      (3L, 3, 1L, 0L, 0L, 0.0, 0L),
      (4L, 2, 0L, 0L, 0L, 0.0, 0L), // empty document keeps its zero rows
      (4L, 3, 0L, 0L, 0L, 0.0, 0L)))
  }

  test("duplicateNgramStats: unigram top_occ agrees with repetitionStats") {
    val df = docs((1L, "a a b c a"), (2L, "z z z"), (3L, "u v w"), (4L, ""))
    val uni = Corpus.duplicateNgramStats(df, "doc_id", "text", ns = Seq(1))
      .select("doc_id", "top_occ").as[(Long, Long)].collect().toMap
    val rep = Corpus.repetitionStats(df, "doc_id", "text")
      .select("doc_id", "top_tok_n").as[(Long, Long)].collect().toMap
    assert(uni === rep)
  }

  test("packSequences: exact global stream, boundary-spanning docs, counts") {
    val rows = Seq(
      (1L, "a b c"), (2L, ""), (3L, "d e f g h i j k l m n o p"),
      (5L, "q r"), (8L, "s t u v w"))
    val L = 5
    val toks = rows.sortBy(_._1).map { case (id, t) =>
      (id, t.split(" ").filter(_.nonEmpty).toSeq :+ "<eos>") }
    val stream = toks.flatMap(_._2)
    val expectedTexts = stream.grouped(L).map(_.mkString(" ")).toSeq
    val nDocs = Array.fill(expectedTexts.size)(0L)
    var off = 0
    for ((_, ts) <- toks if ts.nonEmpty) {
      for (s <- off / L to (off + ts.size - 1) / L) nDocs(s) += 1
      off += ts.size
    }
    val got = Corpus.packSequences(docs(rows: _*), "doc_id", "text", L)
      .orderBy("seq_idx").as[(Long, Long, Long, String)].collect().toSeq
    assert(got.map(_._1) === expectedTexts.indices.map(_.toLong))
    assert(got.map(_._4) === expectedTexts)
    assert(got.map(_._2) === nDocs.toSeq)
    assert(got.init.forall(_._3 == L), "every non-final sequence is full")
    assert(got.last._3 === stream.size - (expectedTexts.size - 1) * L)
  }

  test("packFragments: fragments tile every sequence and match packSequences") {
    val rows = Seq(
      (1L, "a b c"), (2L, ""), (3L, "d e f g h i j k l m n o p"),
      (5L, "q r"), (8L, "s t u v w"))
    val L = 5
    val frags = Corpus.packFragments(docs(rows: _*), "doc_id", "text", L)
      .as[(Long, Long, Long, Long)].collect().toSeq.sortBy(t => (t._1, t._3))
    val seqs = Corpus.packSequences(docs(rows: _*), "doc_id", "text", L)
      .select("seq_idx", "n_docs", "n_tokens").as[(Long, Long, Long)]
      .collect().map(t => t._1 -> (t._2, t._3)).toMap
    assert(frags.map(_._1).toSet === seqs.keySet)
    for ((s, fs) <- frags.groupBy(_._1)) {
      val (nDocs, nTokens) = seqs(s)
      assert(fs.size.toLong === nDocs, s"seq $s fragment count")
      assert(fs.map(_._4).sum === nTokens, s"seq $s token count")
      var pos = 0L // fragments tile [0, n_tokens) with no gap or overlap
      for ((_, _, p, l) <- fs) { assert(p === pos, s"seq $s"); pos += l }
    }
  }

  test("mixtureAllocation: largest-remainder seats, ties, exhaustion cap") {
    // w = floor(sqrt(n)): 10, 4, 2; W=16; base 6/2/1 rem 4/8/4; 1 seat -> b
    assert(Corpus.mixtureAllocation(
      Seq(("a", 100L), ("b", 16L), ("c", 4L)), 10, 0.5) ===
      Map("a" -> 6L, "b" -> 3L, "c" -> 1L))
    // equal remainders: the seat goes to the lexicographically first domain
    assert(Corpus.mixtureAllocation(Seq(("x", 16L), ("y", 16L)), 5, 0.5) ===
      Map("x" -> 3L, "y" -> 2L))
    // domains smaller than their allocation keep all their rows; the
    // total falls short (a: alloc 3 capped to 1, b: alloc 6 capped to 4)
    assert(Corpus.mixtureAllocation(Seq(("a", 1L), ("b", 4L)), 9, 0.5) ===
      Map("a" -> 1L, "b" -> 4L))
  }

  test("mixtureSample: exact per-domain ks, md5-ordered selection") {
    val rows = (0L until 60L).map(i => (i, s"dom${i % 3}", s"text $i"))
    val df = spark.createDataset(rows).toDF("doc_id", "source", "text")
    val got = Corpus.mixtureSample(df, "doc_id", "source",
      totalK = 10, alpha = 0.5, orderCol = "text")
      .select("source", "doc_id").as[(String, Long)].collect().toSeq
    // 20 docs/domain -> w=4 each, W=12: base 3 rem 4 each, 1 seat -> dom0
    val perDom = got.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    assert(perDom === Map("dom0" -> 4L, "dom1" -> 3L, "dom2" -> 3L))
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val expected = rows.groupBy(_._2).toSeq.flatMap { case (dom, rs) =>
      val k = perDom(dom).toInt
      rs.sortBy(r => (md5hex(r._3), r._1)).take(k).map(r => (dom, r._1))
    }.toSet
    assert(got.toSet === expected)
  }

  test("packSequences: sep=None drops empty docs; input partitioning irrelevant") {
    val rows = (0L until 40L).map { i =>
      (i, (0 until (i % 5).toInt).map(j => s"t${i}_$j").mkString(" ")) }
    val L = 8
    val stream = rows.flatMap(_._2.split(" ").filter(_.nonEmpty))
    val expected = stream.grouped(L).map(_.mkString(" ")).toSeq
    for (nPart <- Seq(1, 7)) {
      val df = docs(rows: _*).repartition(nPart)
      val got = Corpus.packSequences(df, "doc_id", "text", L, sep = None)
        .orderBy("seq_idx").as[(Long, Long, Long, String)].collect().toSeq
      assert(got.map(_._4) === expected, s"nPart=$nPart")
      assert(got.map(_._3).sum === stream.size.toLong, s"nPart=$nPart")
    }
  }

  test("splitByHash: total, disjoint, salt-stable, fraction-faithful") {
    val rows = (0L until 2000L).map(i => (i, s"text $i"))
    val df = docs(rows: _*)
    val fr = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val got = Corpus.splitByHash(df, "doc_id", "s1", fr)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(got.size === 2000) // every doc labeled exactly once
    assert(got.values.toSet.subsetOf(Set("train", "val", "test")))
    // same salt => identical assignment; different salt => a different draw
    val again = Corpus.splitByHash(df, "doc_id", "s1", fr)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(again === got)
    val other = Corpus.splitByHash(df, "doc_id", "s2", fr)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(other !== got)
    // empirical fractions near nominal (md5 is uniform; 2000 draws,
    // binomial sd of the 10% classes ~0.7pp — 3pp slack is ~4+ sd)
    val n = got.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(math.abs(n("train") / 2000.0 - 0.8) < 0.03, n.toString)
    assert(math.abs(n("val") / 2000.0 - 0.1) < 0.03, n.toString)
    assert(math.abs(n("test") / 2000.0 - 0.1) < 0.03, n.toString)
    intercept[IllegalArgumentException] {
      Corpus.splitByHash(df, "doc_id", "s", Seq("a" -> 0.5, "b" -> 0.4))
    }
    // a trailing zero-fraction class would format a 5-char hex bound and
    // silently mislabel — rejected loudly (round-7 advice)
    intercept[IllegalArgumentException] {
      Corpus.splitByHash(df, "doc_id", "s", Seq("a" -> 1.0, "b" -> 0.0))
    }
    // a MID-list zero-fraction class is legal and gets exactly nothing
    val withZero = Corpus.splitByHash(df, "doc_id", "s1",
        Seq("a" -> 0.5, "z" -> 0.0, "b" -> 0.5))
      .select("split").as[String].collect()
    assert(!withZero.contains("z"))
  }

  test("epochShuffle: dense permutation, seed-deterministic, partition-invariant") {
    val rows = (0L until 500L).map(i => (i, s"text $i"))
    val base = Corpus.epochShuffle(docs(rows: _*), "doc_id", "e0")
      .as[(Long, Long)].collect().sortBy(_._1)
    assert(base.map(_._1).toSeq === (0L until 500L)) // dense 0..n-1
    assert(base.map(_._2).toSet === rows.map(_._1).toSet) // a permutation
    for (nPart <- Seq(1, 7, 32)) {
      val got = Corpus.epochShuffle(docs(rows: _*).repartition(nPart),
        "doc_id", "e0").as[(Long, Long)].collect().sortBy(_._1)
      assert(got.toSeq === base.toSeq, s"nPart=$nPart")
    }
    val other = Corpus.epochShuffle(docs(rows: _*), "doc_id", "e1")
      .as[(Long, Long)].collect().sortBy(_._1)
    assert(other.map(_._2).toSeq !== base.map(_._2).toSeq)
  }

  test("tokenBudgetSelect: maximal quality-prefix that fits, partition-invariant") {
    // (id, score, tokens): quality order by score desc, id asc
    val rows = Seq((1L, 50L, 30L), (2L, 90L, 40L), (3L, 70L, 40L),
      (4L, 90L, 10L), (5L, 10L, 5L))
    // order: 2(40) cum 40, 4(10) cum 50, 3(40) cum 90 > 80 -> stop; 1, 5 out
    val df = spark.createDataset(rows).toDF("doc_id", "score", "toks")
    for (nPart <- Seq(1, 4)) {
      val got = Corpus.tokenBudgetSelect(df.repartition(nPart), "doc_id",
          col("score"), col("toks"), budget = 80L)
        .select("doc_id", "cum_tokens").as[(Long, Long)].collect().toMap
      assert(got === Map(2L -> 40L, 4L -> 50L), s"nPart=$nPart")
    }
    // zero budget selects nothing; negative throws
    assert(Corpus.tokenBudgetSelect(df, "doc_id", col("score"), col("toks"),
      budget = 0L).count() === 0L)
    intercept[IllegalArgumentException] {
      Corpus.tokenBudgetSelect(df, "doc_id", col("score"), col("toks"), -1L)
    }
  }

  test("qualityFunnel: first-tripped-rule attribution, null-safe, guards") {
    val df = spark.createDataset(Seq(
        (1L, 5L, 0L),   // trips both rules -> attributed to the FIRST
        (2L, 50L, 0L),  // trips only rule 2
        (3L, 50L, 3L),  // kept
        (4L, 5L, 3L)))  // trips only rule 1
      .toDF("doc_id", "nt", "nstop")
    val rules = Seq("too_short" -> (col("nt") < 20),
      "no_stopword" -> (col("nstop") === 0))
    val got = Corpus.qualityFunnel(df, rules)
      .select("doc_id", "verdict").as[(Long, String)].collect().toMap
    assert(got === Map(1L -> "too_short", 2L -> "no_stopword",
      3L -> "kept", 4L -> "too_short"))
    // a null condition result counts as not-tripped (SQL CASE semantics)
    val nullable = spark.createDataset(Seq((1L, Option.empty[Long]),
        (2L, Some(5L)))).toDF("doc_id", "nt")
    val got2 = Corpus.qualityFunnel(nullable,
        Seq("small" -> (col("nt") < 20)))
      .select("doc_id", "verdict").as[(Long, String)].collect().toMap
    assert(got2 === Map(1L -> "kept", 2L -> "small"))
    intercept[IllegalArgumentException] {
      Corpus.qualityFunnel(df,
        Seq("x" -> lit(true), "x" -> lit(false)))
    }
    intercept[IllegalArgumentException] {
      Corpus.qualityFunnel(df, Seq("kept" -> lit(true)))
    }
  }

  test("shardManifest: exact cut sizes, token mass, partition-invariant") {
    val rows = (0L until 250L).map(i => (i, s"text $i", i % 7 + 1))
    val df = spark.createDataset(rows).toDF("doc_id", "text", "w")
    def manifest(nPart: Int) =
      Corpus.shardManifest(df.repartition(nPart), "doc_id", "e0", 100,
          col("w")).orderBy("shard_idx")
        .as[(Long, Long, Long, Long, Long)].collect().toSeq
    val base = manifest(1)
    assert(base.map(t => (t._1, t._2)) ===
      Seq((0L, 100L), (1L, 100L), (2L, 50L))) // exact doc cuts + remainder
    assert(base.map(_._3).sum === rows.map(_._3).sum) // token mass conserved
    assert(base.map(t => (t._4, t._5)) ===
      Seq((0L, 99L), (100L, 199L), (200L, 249L))) // contiguous pos ranges
    assert(manifest(13) === base)
    // manifest shard of a doc agrees with epochShuffle's position
    val pos = Corpus.epochShuffle(df, "doc_id", "e0")
      .as[(Long, Long)].collect().toMap.map(_.swap) // id -> pos... inverse
    assert(rows.map(_._1).forall(id => pos.contains(id)))
  }

  test("cdcChunks: tiling, short/empty docs, insertion-robust boundaries") {
    val rng = new scala.util.Random(41)
    val words = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta", "iota", "kappa")
    val body = (0 until 300).map(_ => words(rng.nextInt(words.size)))
    val df = docs(
      (1L, body.mkString(" ")),
      (2L, "one two three"), // shorter than any window-full chunk run
      (3L, ""))              // empty: no chunks
    val got = Corpus.cdcChunks(df, "doc_id", "text", w = 4)
      .orderBy("doc_id", "chunk_idx")
      .as[(Long, Int, Int, Int, Long, String)].collect().toSeq
    val byDoc = got.groupBy(_._1)
    assert(!byDoc.contains(3L))
    assert(byDoc(2L) === Seq((2L, 0, 1, 3, 3L, byDoc(2L).head._6)))
    // chunks tile [1, n] exactly, in order
    val c1 = byDoc(1L)
    assert(c1.head._3 === 1 && c1.last._4 === 300)
    c1.sliding(2).foreach { case Seq(a, b) =>
      assert(b._3 === a._4 + 1); case _ => }
    assert(c1.map(_._5).sum === 300L)
    // insertion robustness: prepend two tokens — all chunks after the
    // first surviving boundary have IDENTICAL hashes (just shifted)
    val shifted = docs((1L, ("x y " + body.mkString(" "))))
    val got2 = Corpus.cdcChunks(shifted, "doc_id", "text", w = 4)
      .orderBy("chunk_idx")
      .as[(Long, Int, Int, Int, Long, String)].collect().toSeq
    val common = c1.map(_._6).toSet.intersect(got2.map(_._6).toSet)
    // every original chunk except (at most) the first re-appears
    assert(common.size >= c1.size - 1,
      s"CDC lost ${c1.size - common.size} chunks to a 2-token prepend")
  }

  test("crossDocNgrams: distinct-doc frequency, min-docs floor, tie order") {
    val df = docs(
      (1L, "a b c d"),   // bigrams: "a b" "b c" "c d"
      (2L, "a b c x"),   // "a b" "b c" "c x"
      (3L, "a b a b"),   // distinct per doc: "a b" "b a" — counts once
      (4L, "z z z z"))   // "z z" only in one doc -> filtered by minDocs=2
    val got = Corpus.crossDocNgrams(df, "doc_id", "text", n = 2,
      minDocs = 2, k = 10).as[(String, Long)].collect().toSeq
    assert(got === Seq(("a b", 3L), ("b c", 2L))) // freq desc, gram asc
  }
}
