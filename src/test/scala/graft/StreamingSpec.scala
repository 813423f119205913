package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.EventStream

/** Streaming results must equal the equivalent batch queries on the same
  * parquet input (memory sink + processAllAvailable drives the whole file
  * set through synchronously).
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  /** The streaming file source consumes a directory; stage the single
    * events.parquet file into one.
    */
  private lazy val eventsDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-events")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"),
      dir.resolve("events.parquet"))
    dir.toString
  }

  test("streaming daily rollup equals batch q_events_daily") {
    val q = EventStream.dailyRollup(
        EventStream.readEvents(spark, eventsDir))
      .writeStream.outputMode(OutputMode.Complete())
      .format("memory").queryName("daily_out").start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("daily_out")
      .select($"event_type", $"day", $"n", $"value_cents")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2))
    val want = SparkEntry.queries("q_events_daily")(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2))
    assert(got.toSeq === want.toSeq)
  }

  test("streamed cohort retention MV equals batch cohortRetention") {
    val evDir = java.nio.file.Files.createTempDirectory("graft-cohort-ev").toString
    val stateDir = java.nio.file.Files.createTempDirectory("graft-cohort-st").toString
    val events = spark.read.parquet(s"$sf/events.parquet")
    // two files -> two micro-batches; the split puts some users' FIRST
    // event in batch 1, so the first_touch min-merge is actually exercised
    events.filter($"event_id" % 2 === 0).coalesce(1).write.mode("append").parquet(evDir)
    events.filter($"event_id" % 2 === 1).coalesce(1).write.mode("append").parquet(evDir)
    val q = EventStream.cohortRetentionStream(
      EventStream.readEvents(spark, evDir, maxFilesPerTrigger = Some(1)),
      stateDir, nBuckets = 8)
    q.processAllAvailable()
    q.stop()
    def key(df: org.apache.spark.sql.DataFrame) = df
      .select($"cohort_day", $"offset_days", $"n_users", $"n_events")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    val got = key(EventStream.readRetention(spark, stateDir))
    val want = key(EventStream.cohortRetention(
      graft.Tables.events(spark, sf)))
    assert(got === want)
    // a user's first touch lives in exactly one bucket row
    assert(EventStream.readFirstTouch(spark, stateDir)
      .groupBy("user_id").count().filter($"count" > 1).count() === 0L)
  }

  test("state-table reads: missing path is empty, corrupt table FAILS loudly") {
    // missing path (first batch): empty frame, not an error
    val absent = java.nio.file.Files.createTempDirectory("graft-st-absent").toString
    assert(EventStream.readFirstTouch(spark, s"$absent/nope").count() === 0L)
    assert(graft.streaming.TermStatsStream
      .readTermDf(spark, s"$absent/nope2").count() === 0L)
    // corrupt table (exists, unreadable): must THROW, not read as empty —
    // a silent empty read would let the min-merge overwrite touched
    // buckets with batch-local values (round-7 advice, medium)
    val corrupt = java.nio.file.Files.createTempDirectory("graft-st-corrupt").toString
    val ft = new java.io.File(s"$corrupt/first_touch")
    ft.mkdirs()
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$corrupt/first_touch/part-0000.parquet"),
      "not a parquet file".getBytes)
    intercept[Exception] {
      EventStream.readFirstTouch(spark, corrupt).count()
    }
  }

  test("stateful sessionization equals batch q_sessionize") {
    val events = EventStream.readEvents(spark, eventsDir)
      .select($"event_id", $"user_id", unix_micros($"ts").as("tsMicros"))
      .as[EventStream.Event]
    // AvailableNow (not processAllAvailable): with ProcessingTimeTimeout
    // armed, the engine keeps scheduling timeout-check batches, so
    // processAllAvailable's no-new-data latch never settles; AvailableNow
    // processes the full input and then terminates the query.
    val q = EventStream.sessionize(events)
      .writeStream.outputMode(OutputMode.Update())
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .format("memory").queryName("sess_out").start()
    q.awaitTermination(120000L)
    q.stop()
    // last update per user = final session count
    val got = spark.table("sess_out")
      .groupBy($"user_id").agg(max($"n_sessions").as("n_sessions"))
      .groupBy($"n_sessions").agg(count(lit(1)).as("n_users"))
      .collect().map(r => (r.getInt(0).toLong, r.getLong(1))).sortBy(_._1)
    val want = SparkEntry.queries("q_sessionize")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(got.toSeq === want.toSeq)
  }

  test("streaming LSH candidates cover the batch verified near-dup pairs") {
    val docsDir = {
      val dir = java.nio.file.Files.createTempDirectory("graft-docs")
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$sf/documents.parquet"),
        dir.resolve("documents.parquet"))
      dir.toString
    }
    val schema = spark.read.parquet(docsDir).schema
    val stream = spark.readStream.schema(schema).parquet(docsDir)
    // bucketCap matches the batch maxBucketSize so the candidate sets align
    val q = graft.streaming.DocStream
      .nearDupCandidates(stream, "doc_id", "text", bucketCap = 1000)
      .writeStream.outputMode(OutputMode.Append())
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .format("memory").queryName("cand_out").start()
    q.awaitTermination(120000L)
    q.stop()
    val got = spark.table("cand_out")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = graft.functions.Dedup
      .verifiedNearDupPairs(graft.Tables.documents(spark, sf),
        "doc_id", "text", threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(want.subsetOf(got), s"missing: ${want -- got}")
    // and nowhere near the all-pairs blowup (500 docs -> 124750 pairs)
    assert(got.size < 5000, s"candidate explosion: ${got.size}")
  }

  test("saturated LSH buckets are observable through the accumulator") {
    val docsDir = {
      val dir = java.nio.file.Files.createTempDirectory("graft-docs-sat")
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$sf/documents.parquet"),
        dir.resolve("documents.parquet"))
      dir.toString
    }
    val schema = spark.read.parquet(docsDir).schema
    val sat = spark.sparkContext.longAccumulator("graft.nearDup.saturatedDrops")
    // bucketCap=1 saturates immediately on any shared bucket: 500 docs of
    // a 30-word vocabulary collide constantly, so drops MUST register
    val q = graft.streaming.DocStream
      .nearDupCandidates(spark.readStream.schema(schema).parquet(docsDir),
        "doc_id", "text", bucketCap = 1, saturationCounter = Some(sat))
      .writeStream.outputMode(OutputMode.Append())
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .format("memory").queryName("sat_out").start()
    q.awaitTermination(120000L)
    q.stop()
    assert(sat.value > 0L, "expected saturated-bucket drops to be counted")
  }

  test("two-query streaming near-dup DROP pipeline equals the batch kept set") {
    val docsDir = {
      val dir = java.nio.file.Files.createTempDirectory("graft-docs-drop")
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$sf/documents.parquet"),
        dir.resolve("documents.parquet"))
      dir.toString
    }
    val candDir = java.nio.file.Files.createTempDirectory("graft-cands").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-cands-ckpt").toString
    val schema = spark.read.parquet(docsDir).schema
    // query 1: stateful candidate generation → parquet sink
    val q1 = graft.streaming.DocStream
      .nearDupCandidates(spark.readStream.schema(schema).parquet(docsDir),
        "doc_id", "text", bucketCap = 1000)
      .writeStream.outputMode(OutputMode.Append())
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .format("parquet").option("path", candDir).start()
    q1.awaitTermination(120000L)
    q1.stop()
    // query 2: candidate stream → exact-jaccard verify + first-wins drop
    val candSchema = spark.read.parquet(candDir).schema
    val corpus = graft.Tables.documents(spark, sf)
    val q2 = graft.streaming.DocStream
      .verifiedDrops(spark.readStream.schema(candSchema).parquet(candDir),
        corpus, "doc_id", "text", threshold = 0.8)
      .writeStream.outputMode(OutputMode.Append())
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .format("memory").queryName("drops_out").start()
    q2.awaitTermination(120000L)
    q2.stop()
    val drops = spark.table("drops_out").collect().map(_.getLong(0)).toSet
    val allIds = corpus.select($"doc_id").collect().map(_.getLong(0)).toSet
    val batchKept = graft.functions.Dedup
      .nearDupKeepCorpus(corpus, "doc_id", "text", threshold = 0.8)
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(allIds -- drops === batchKept)
    assert(drops.nonEmpty) // the sf0.001 corpus does contain near-dups
  }

  test("streaming verified pairs + sink-side clustering equals batch dupClusters") {
    val docsDir = {
      val dir = java.nio.file.Files.createTempDirectory("graft-docs-clu")
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$sf/documents.parquet"),
        dir.resolve("documents.parquet"))
      dir.toString
    }
    val candDir = java.nio.file.Files.createTempDirectory("graft-clu-cands").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-clu-ckpt").toString
    val schema = spark.read.parquet(docsDir).schema
    // query 1: stateful candidate generation → parquet sink
    val q1 = graft.streaming.DocStream
      .nearDupCandidates(spark.readStream.schema(schema).parquet(docsDir),
        "doc_id", "text", bucketCap = 1000)
      .writeStream.outputMode(OutputMode.Append())
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .format("parquet").option("path", candDir).start()
    q1.awaitTermination(120000L)
    q1.stop()
    // query 2: candidate stream → exact-jaccard verified PAIRS → sink
    val candSchema = spark.read.parquet(candDir).schema
    val corpus = graft.Tables.documents(spark, sf)
    val pairDir = java.nio.file.Files.createTempDirectory("graft-clu-pairs").toString
    val pairCkpt = java.nio.file.Files.createTempDirectory("graft-clu-pckpt").toString
    val q2 = graft.streaming.DocStream
      .verifiedPairs(spark.readStream.schema(candSchema).parquet(candDir),
        corpus, "doc_id", "text", threshold = 0.8)
      .writeStream.outputMode(OutputMode.Append())
      .option("checkpointLocation", pairCkpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .format("parquet").option("path", pairDir).start()
    q2.awaitTermination(120000L)
    q2.stop()
    // sink-side relabel of the accumulated pair graph == batch clusters
    val streamed = graft.functions.Dedup
      .clustersFromPairs(corpus, "doc_id", spark.read.parquet(pairDir))
      .as[(Long, Long)].collect().toMap
    val batch = graft.functions.Dedup
      .dupClusters(corpus, "doc_id", "text", threshold = 0.8)
      .as[(Long, Long)].collect().toMap
    assert(streamed === batch)
    assert(streamed.exists { case (id, c) => id != c }) // real dups exist
  }

  test("stream-static as-of join equals the batch as-of join") {
    // purchases stream in; the click history is the static side
    val ev = graft.Tables.events(spark, sf)
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"ts".as("p_ts"), $"event_id".as("purchase_id"))
    val clicks = ev.filter($"event_type" === "click")
      .select($"user_id", $"ts".as("c_ts"), $"event_id".as("click_id"))
    val pDir = java.nio.file.Files.createTempDirectory("graft-asof-p").toString
    purchases.write.mode("overwrite").parquet(pDir)
    val q = graft.operators.TemporalJoins.asofJoinStreamStatic(
        spark.readStream.schema(purchases.schema).parquet(pDir),
        clicks, Seq("user_id"), "p_ts", "c_ts")
      .writeStream.outputMode(OutputMode.Append())
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .format("memory").queryName("asof_out").start()
    q.awaitTermination(120000L)
    q.stop()
    val streamed = spark.table("asof_out")
      .select($"purchase_id", $"click_id")
      .as[(Long, Option[Long])].collect().toMap
    val batch = graft.operators.TemporalJoins
      .asofJoinBackward(purchases, clicks, Seq("user_id"), "p_ts", "c_ts")
      .select($"purchase_id", $"click_id")
      .as[(Long, Option[Long])].collect().toMap
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }

  test("stream-static range join equals the batch range join") {
    // clicks stream in; the error windows are the static side. rangeJoin's
    // plan is a stream-static equi-join on (user_id, bucket) + residual
    // between-filter — no state store, no watermark needed.
    val ev = graft.Tables.events(spark, sf)
    val clicks = ev.filter($"event_type" === "click")
      .select($"user_id", unix_micros($"ts").as("p"), $"event_id".as("click_id"))
    val windows = ev.filter($"event_type" === "error")
      .select($"user_id", unix_micros($"ts").as("lo"),
        (unix_micros($"ts") + 14400L * 1000000L).as("hi"),
        $"event_id".as("error_id"))
    val cDir = java.nio.file.Files.createTempDirectory("graft-range-c").toString
    clicks.write.mode("overwrite").parquet(cDir)
    val q = graft.operators.TemporalJoins.rangeJoin(
        spark.readStream.schema(clicks.schema).parquet(cDir),
        windows, "p", "lo", "hi",
        bucketWidth = 14400L * 1000000L, keys = Seq("user_id"))
      .select($"error_id", $"click_id")
      .writeStream.outputMode(OutputMode.Append())
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .format("memory").queryName("range_out").start()
    q.awaitTermination(120000L)
    q.stop()
    val streamed = spark.table("range_out")
      .as[(Long, Long)].collect().toSet
    val batch = graft.operators.TemporalJoins
      .rangeJoin(clicks, windows, "p", "lo", "hi",
        bucketWidth = 14400L * 1000000L, keys = Seq("user_id"))
      .select($"error_id", $"click_id")
      .as[(Long, Long)].collect().toSet
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }

  test("streaming media decode + stats equals batch mediaStats") {
    val docsDir = {
      val dir = java.nio.file.Files.createTempDirectory("graft-media")
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$sf/documents.parquet"),
        dir.resolve("documents.parquet"))
      dir.toString
    }
    implicit val s: org.apache.spark.sql.SparkSession = spark
    val schema = spark.read.parquet(docsDir).schema
    val q = graft.streaming.MediaStream
      .mediaStatsStream(spark.readStream.schema(schema).parquet(docsDir),
        "doc_id", "text")
      .writeStream.outputMode(OutputMode.Complete())
      .format("memory").queryName("media_out").start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("media_out")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    val want = graft.multimodal.Multimodal
      .mediaStats(graft.Tables.documents(spark, sf), "doc_id", "text")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    assert(got.toSeq === want.toSeq)
  }

  test("streaming termStats: incremental df/totals tables equal batch after two micro-batches") {
    import graft.streaming.TermStatsStream
    val docs = graft.Tables.documents(spark, sf)
    val docsDir = java.nio.file.Files.createTempDirectory("graft-ts-docs").toString
    val statsDir = java.nio.file.Files.createTempDirectory("graft-ts-stats").toString + "/stats"
    // two files -> two micro-batches with maxFilesPerTrigger=1
    docs.filter($"doc_id" % 2 === 0).coalesce(1).write.mode("append").parquet(docsDir)
    docs.filter($"doc_id" % 2 === 1).coalesce(1).write.mode("append").parquet(docsDir)
    val schema = spark.read.parquet(docsDir).schema
    val q = TermStatsStream.start(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(docsDir),
      "doc_id", "text", statsDir, nBuckets = 8)
    q.processAllAvailable()
    q.stop()
    val totals = TermStatsStream.readTotals(spark, statsDir).head()
    assert(totals.getLong(2) >= 1L, "expected at least two micro-batches")
    // totals equal the batch corpus aggregates
    val wantTotals = docs.agg(count(lit(1)),
      sum(size(graft.functions.Text.tokens($"text")).cast("long"))).head()
    assert(totals.getLong(0) === wantTotals.getLong(0))
    assert(totals.getLong(1) === wantTotals.getLong(1))
    // the incrementally-merged (term, doc_freq) table equals the batch one
    val got = TermStatsStream.readTermDf(spark, statsDir)
      .select($"term", $"doc_freq").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    val want = graft.functions.Corpus.termStats(docs, "doc_id", "text")
      .select($"term", $"doc_freq").distinct().collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got === want)
    // stream-static scoring against the maintained tables matches the
    // batch tfidf for the same documents (same formula, same inputs)
    val probe = docs.filter($"doc_id" < 3)
    val gotScore = TermStatsStream
      .scoreTfIdf(spark, statsDir, probe, "doc_id", "text")
      .select($"doc_id", $"term", $"tf", $"tfidf").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    val wantScore = graft.functions.Corpus.termStats(docs, "doc_id", "text")
      .filter($"doc_id" < 3)
      .select($"doc_id", $"term", $"tf", $"tfidf").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    assert(gotScore === wantScore)
    // replay idempotence: re-running a finished stream over the same files
    // must not double-count (checkpointless restart reprocesses batch 0+1,
    // but the batch-id stamp skips... a fresh query gets fresh batch ids,
    // so assert instead on the stamped guard directly)
    assert(TermStatsStream.readTermDf(spark, statsDir)
      .groupBy("term").count().filter($"count" > 1).count() === 0L,
      "a term must appear in exactly one bucket row")
  }

  test("streaming search index: postings reconstitute the batch index after two micro-batches") {
    import graft.streaming.TermStatsStream
    val docs = graft.Tables.documents(spark, sf)
    val docsDir = java.nio.file.Files.createTempDirectory("graft-si-docs").toString
    val statsDir = java.nio.file.Files.createTempDirectory("graft-si-stats").toString + "/stats"
    docs.filter($"doc_id" % 2 === 0).coalesce(1).write.mode("append").parquet(docsDir)
    docs.filter($"doc_id" % 2 === 1).coalesce(1).write.mode("append").parquet(docsDir)
    val schema = spark.read.parquet(docsDir).schema
    val q = TermStatsStream.start(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(docsDir),
      "doc_id", "text", statsDir, nBuckets = 8)
    q.processAllAvailable()
    q.stop()
    assert(TermStatsStream.readTotals(spark, statsDir).head().getLong(2) >= 1L,
      "expected at least two micro-batches")
    // streamed index == the batch bm25Stats rebuild, column for column
    def key(df: org.apache.spark.sql.DataFrame) = df
      .select($"doc_id", $"term", $"tf", $"dl", $"doc_freq", $"n_docs", $"sum_dl")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toSet
    val got = key(TermStatsStream.readIndex(spark, statsDir, "doc_id"))
    val want = key(graft.functions.Corpus.bm25Stats(docs, "doc_id", "text"))
    assert(got === want)
    // bucket-pruned top-k against the incremental index == batch searchTopK
    val terms = docs.select(explode(graft.functions.Text.tokens($"text")).as("t"))
      .groupBy("t").count().orderBy($"count".desc, $"t").limit(3)
      .collect().map(_.getString(0)).toSeq
    def topk(df: org.apache.spark.sql.DataFrame) = df
      .select($"doc_id", $"n_hit_terms", $"score_u")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val gotQ = topk(TermStatsStream.searchIndexStream(
      spark, statsDir, "doc_id", terms, nBuckets = 8, k = 10))
    val wantQ = topk(graft.functions.Corpus.searchTopK(
      docs, "doc_id", "text", terms, 10))
    assert(gotQ === wantQ)
    assert(gotQ.nonEmpty)
    // compaction folds the per-batch partitions into batch=-1 per bucket
    // without changing the index contents or the pruned query result
    TermStatsStream.compactPostings(spark, statsDir)
    assert(key(TermStatsStream.readIndex(spark, statsDir, "doc_id")) === want)
    val bucketDirs = new java.io.File(statsDir + "/postings").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("bucket="))
    assert(bucketDirs.nonEmpty)
    bucketDirs.foreach { b =>
      val batches = b.listFiles().filter(_.isDirectory).map(_.getName).toSeq
      assert(batches === Seq("batch=-1"), s"${b.getName} not compacted: $batches")
    }
    assert(topk(TermStatsStream.searchIndexStream(
      spark, statsDir, "doc_id", terms, nBuckets = 8, k = 10)) === wantQ)
  }

  test("streaming real image decode equals batch (stateless ImageIO map)") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    val docsDir = {
      val dir = java.nio.file.Files.createTempDirectory("graft-media-img")
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$sf/documents.parquet"),
        dir.resolve("documents.parquet"))
      dir.toString
    }
    val schema = spark.read.parquet(docsDir).schema
    val q = graft.streaming.MediaStream
      .imageDecodeStream(spark.readStream.schema(schema).parquet(docsDir),
        "doc_id")
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("img_out").start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("img_out").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(3), r.getInt(4),
        r.getInt(5), r.getLong(6)))
      .sortBy(_._1)
    val want = graft.multimodal.Multimodal
      .decodeImages(graft.multimodal.Multimodal.packImages(
        graft.Tables.documents(spark, sf).select($"doc_id"), "doc_id"))
      .collect()
      .map(m => (m.doc_id, m.kind, m.width, m.height, m.channels, m.pixel_sum))
      .sortBy(_._1)
    assert(got.toSeq === want.toSeq)
    assert(want.nonEmpty)
  }

  test("streaming video demux equals batch (stateless RIFF-walk flatMap)") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    val docsDir = {
      val dir = java.nio.file.Files.createTempDirectory("graft-media-vid")
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$sf/documents.parquet"),
        dir.resolve("documents.parquet"))
      dir.toString
    }
    val schema = spark.read.parquet(docsDir).schema
    val q = graft.streaming.MediaStream
      .videoDemuxStream(spark.readStream.schema(schema).parquet(docsDir),
        "doc_id")
      .select($"doc_id", $"frame_no", octet_length($"frame").as("nb"))
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("vid_out").start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("vid_out").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).sortBy(x => (x._1, x._2))
    // JPEG encode is deterministic, so stream and batch frame bytes match
    val want = graft.multimodal.Multimodal
      .demuxVideo(graft.multimodal.Multimodal.packVideo(
        graft.Tables.documents(spark, sf).select($"doc_id"), "doc_id"))
      .select($"doc_id", $"frame_no", octet_length($"frame").as("nb"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).sortBy(x => (x._1, x._2))
    assert(got.toSeq === want.toSeq)
    assert(want.nonEmpty)
  }

  test("streaming audio chunks + image patches equal batch (stateless 1->N maps)") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    val docsDir = {
      val dir = java.nio.file.Files.createTempDirectory("graft-media-seg")
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$sf/documents.parquet"),
        dir.resolve("documents.parquet"))
      dir.toString
    }
    val schema = spark.read.parquet(docsDir).schema
    val q1 = graft.streaming.MediaStream
      .audioChunkStream(spark.readStream.schema(schema).parquet(docsDir),
        "doc_id", chunkFrames = 512, strideFrames = 384)
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("achunk_out").start()
    val q2 = graft.streaming.MediaStream
      .imagePatchStream(spark.readStream.schema(schema).parquet(docsDir),
        "doc_id", pSize = 8)
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("ipatch_out").start()
    q1.processAllAvailable(); q1.stop()
    q2.processAllAvailable(); q2.stop()
    val ids = graft.Tables.documents(spark, sf).select($"doc_id")
    val wantChunks = graft.multimodal.Multimodal
      .chunkAudio(graft.multimodal.Multimodal.packAudio(ids, "doc_id"), 512, 384)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3)))
      .sortBy(x => (x._1, x._2))
    val gotChunks = spark.table("achunk_out").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3)))
      .sortBy(x => (x._1, x._2))
    assert(gotChunks.toSeq === wantChunks.toSeq)
    val wantPatches = graft.multimodal.Multimodal
      .patchImages(graft.multimodal.Multimodal.packImages(ids, "doc_id"), 8)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(5)))
      .sortBy(x => (x._1, x._2, x._3))
    val gotPatches = spark.table("ipatch_out").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(5)))
      .sortBy(x => (x._1, x._2, x._3))
    assert(gotPatches.toSeq === wantPatches.toSeq)
    assert(wantChunks.nonEmpty && wantPatches.nonEmpty)
  }

  test("streaming IVF probe equals batch ivfSearch on the same index") {
    import graft.functions.Similarity
    val emb = graft.Tables.embeddings(spark, sf)
    val idxDir = java.nio.file.Files.createTempDirectory("graft-ivf-stream").toString
    Similarity.ivfWrite(emb, "vec_id", "embedding", idxDir, nCells = 8)
    val queryIds = Seq(3L, 17L, 42L)
    val queries = emb.filter($"vec_id".isin(queryIds: _*))
      .select($"vec_id", $"embedding")
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toSeq
    // stage the query set as a parquet dir so it arrives as a stream batch
    val qDir = java.nio.file.Files.createTempDirectory("graft-ivf-q").toString
    emb.filter($"vec_id".isin(queryIds: _*)).select($"vec_id", $"embedding")
      .write.mode("overwrite").parquet(qDir)
    val qSchema = spark.read.parquet(qDir).schema
    val results = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Int)]
    val q = graft.streaming.MediaStream.ivfProbeStream(
      spark.readStream.schema(qSchema).parquet(qDir), idxDir, k = 5, nProbe = 3,
      sink = (df, _) => results.synchronized {
        results ++= df.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
      })
    q.awaitTermination(120000L)
    q.stop()
    val want = Similarity.ivfSearch(spark, idxDir, queries, k = 5, nProbe = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
      .sortBy(t => (t._1, t._3))
    assert(results.sortBy(t => (t._1, t._3)).toSeq === want.toSeq)
    assert(want.nonEmpty)
  }

  test("streaming PII scrub equals the batch scrub (stateless map)") {
    val docsDir = {
      val dir = java.nio.file.Files.createTempDirectory("graft-docs-pii")
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$sf/documents.parquet"),
        dir.resolve("documents.parquet"))
      dir.toString
    }
    val schema = spark.read.parquet(docsDir).schema
    val dirty = (df: org.apache.spark.sql.DataFrame) => df.select($"doc_id",
      concat($"text", lit(" ping admin@example.net or https://x.example/q")).as("t"))
    val q = dirty(spark.readStream.schema(schema).parquet(docsDir))
      .select($"doc_id", graft.functions.Corpus.scrubPii($"t").as("scrubbed"))
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("pii_out").start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("pii_out")
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val want = dirty(graft.Tables.documents(spark, sf))
      .select($"doc_id", graft.functions.Corpus.scrubPii($"t"))
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    assert(got.toSeq === want.toSeq)
    assert(got.forall(_._2.contains("<EMAIL>")))
  }

  test("streaming corpus diff equals the batch diff on added/changed") {
    val docsDir = {
      val dir = java.nio.file.Files.createTempDirectory("graft-docs-diff")
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$sf/documents.parquet"),
        dir.resolve("documents.parquet"))
      dir.toString
    }
    val docs = graft.Tables.documents(spark, sf)
    // old snapshot: drop some ids (-> added), text as-is
    val oldSnap = docs.filter($"doc_id" % 11 =!= 3)
    // new snapshot streams in with some texts rewritten (-> changed)
    val schema = spark.read.parquet(docsDir).schema
    val rewrite = (df: org.apache.spark.sql.DataFrame) => df.select($"doc_id",
      when($"doc_id" % 9 === 0, concat($"text", lit(" updated rev2")))
        .otherwise($"text").as("text"))
    val q = graft.streaming.DocStream.diffStream(
        rewrite(spark.readStream.schema(schema).parquet(docsDir)),
        oldSnap, "doc_id", "text")
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("diff_out").start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("diff_out")
      .as[(Long, String)].collect().toSet
    val want = graft.functions.Corpus
      .corpusDiff(oldSnap, rewrite(docs), "doc_id", "text")
      .filter($"status" =!= "removed") // absence is a batch-only fact
      .as[(Long, String)].collect().toSet
    assert(got === want)
    assert(want.exists(_._2 == "added") && want.exists(_._2 == "changed"))
  }

  test("streaming frequent-ngrams sketch merges state across micro-batches") {
    // two copies of the file, one per micro-batch -> expected counts are
    // exactly DOUBLE the single-file batch counts (exact regime), which
    // only holds if the sketch state merges correctly across batches
    val docsDir = {
      val dir = java.nio.file.Files.createTempDirectory("graft-docs-freq")
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$sf/documents.parquet"),
        dir.resolve("documents_a.parquet"))
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$sf/documents.parquet"),
        dir.resolve("documents_b.parquet"))
      dir.toString
    }
    val schema = spark.read.parquet(docsDir).schema
    val q = graft.streaming.DocStream.freqNgramsStream(
        spark.readStream.schema(schema).option("maxFilesPerTrigger", "1")
          .parquet(docsDir), "text", n = 3, capacity = 65536)
      .writeStream.outputMode(OutputMode.Complete())
      .format("memory").queryName("freq_out").start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("freq_out")
      .select(explode($"summary").as(Seq("item", "n")))
      .as[(String, Long)].collect().toMap
    val want = graft.operators.FrequentItems.topKSketch(
        graft.Tables.documents(spark, sf)
          .select(graft.functions.Text.tokens($"text").as("__toks"))
          .select(explode(graft.functions.Text.shinglesOfTokens($"__toks", 3))
            .as("gram")),
        $"gram", capacity = 65536, k = Int.MaxValue)
      .select($"item", $"approx_n").as[(String, Long)].collect().toMap
      .map { case (t, c) => t -> c * 2 }
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("streaming chunking equals batch chunkDocs (stateless map)") {
    val docsDir = {
      val dir = java.nio.file.Files.createTempDirectory("graft-docs-chunk")
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$sf/documents.parquet"),
        dir.resolve("documents.parquet"))
      dir.toString
    }
    val schema = spark.read.parquet(docsDir).schema
    val q = graft.functions.Corpus.chunkDocs(
        spark.readStream.schema(schema).parquet(docsDir),
        "doc_id", "text", window = 32, stride = 24)
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("chunk_out").start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("chunk_out")
      .as[(Long, Int, String, Long)].collect().toSet
    val want = graft.functions.Corpus.chunkDocs(
        graft.Tables.documents(spark, sf), "doc_id", "text", 32, 24)
      .as[(Long, Int, String, Long)].collect().toSet
    assert(got === want && want.nonEmpty)
  }

  test("stream-stream attribution join equals batch q_attribution") {
    val q = graft.streaming.EventStream.attributionStream(
        graft.streaming.EventStream.readEvents(spark, eventsDir), "4 hours")
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("attr_out").start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("attr_out")
      .as[(Long, Long, Long, Long)].collect().toSet
    val want = SparkEntry.queries("q_attribution")(spark, sf)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got === want)
    assert(want.nonEmpty)
  }

  test("streaming dedup keeps one row per event_type within the watermark") {
    val q = EventStream.dedupStream(
        EventStream.readEvents(spark, eventsDir), Seq("event_type"))
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("dedup_out").start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("dedup_out").select($"event_type")
      .collect().map(_.getString(0)).sorted
    val want = SparkEntry.queries("q_events_daily")(spark, sf)
      .select($"event_type").distinct()
      .collect().map(_.getString(0)).sorted
    assert(got.toSeq === want.toSeq) // exactly one survivor per type
  }
}
