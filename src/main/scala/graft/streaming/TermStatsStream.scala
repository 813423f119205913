package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.functions.Text

/** Streaming TF-IDF / BM25 — the incremental twin of
  * [[graft.functions.Corpus.termStats]] / `bm25Stats`.
  *
  * A streaming aggregate over terms has no event time, so Append+parquet
  * cannot sink it and plain parquet cannot upsert (the design constraint
  * recorded in round 4). The workable shape, built here, is the two-query
  * pipeline the near-dup DROP path already uses:
  *
  *  1. INGEST ([[start]]): `foreachBatch` maintains the (term, doc_freq)
  *     table under `statsDir/term_df`, hash-bucketed on the term into
  *     `nBuckets` partitions and updated via DYNAMIC partition overwrite —
  *     each micro-batch rewrites only the buckets its terms touch, never
  *     the whole vocabulary — plus the (term, doc, tf, dl) posting rows
  *     under `statsDir/postings`, written into (bucket, batch) partitions
  *     so the inverted index itself is incrementally maintained
  *     ([[readIndex]]/[[searchIndexStream]] are the query side). Corpus totals (n_docs, sum_dl) live as a
  *     one-row table under `statsDir/totals`, stamped with the batch id so
  *     a foreachBatch replay (at-least-once sink contract) is skipped
  *     idempotently rather than double-counted.
  *  2. SCORE ([[scoredStream]]): a second query's stream-static join —
  *     each arriving query batch re-reads the current stats tables and
  *     scores against them (build-once/score-many, the IVF probe shape).
  *
  * Works because each document arrives exactly once (a file-stream corpus
  * ingest), so a term's doc_freq delta per batch is just the count of new
  * docs containing it — df merges by addition, which is what makes the
  * incremental table equal the batch aggregate (asserted stream≡batch in
  * StreamingSpec after two micro-batches).
  *
  * Scale posture: per batch, work is O(batch terms) + a read of the
  * touched buckets only (`bucket IN (...)` filter → partition pruning);
  * the full vocabulary is never shuffled or rewritten. The totals
  * read-modify-write and the bucket overwrite are two separate writes —
  * a crash between them can leave one batch applied to only one table
  * (the usual multi-table foreachBatch caveat; the batch-id stamp makes
  * the replay converge on totals, and bucket overwrite is idempotent).
  */
object TermStatsStream {

  private def termDfPath(statsDir: String) = s"$statsDir/term_df"
  private def totalsPath(statsDir: String) = s"$statsDir/totals"
  private def postingsPath(statsDir: String) = s"$statsDir/postings"

  /** Current (term, doc_freq, bucket) table (empty before the first batch). */
  def readTermDf(spark: SparkSession, statsDir: String): DataFrame =
    StateTables.readIfExists(spark, termDfPath(statsDir)).getOrElse {
      import spark.implicits._
      Seq.empty[(String, Long, Int)].toDF("term", "doc_freq", "bucket")
    }

  /** Current one-row (n_docs, sum_dl, last_batch) totals. */
  def readTotals(spark: SparkSession, statsDir: String): DataFrame =
    StateTables.readIfExists(spark, totalsPath(statsDir)).getOrElse {
      import spark.implicits._
      Seq.empty[(Long, Long, Long)].toDF("n_docs", "sum_dl", "last_batch")
    }

  /** Current posting rows (empty before the first batch): one row per
    * (term, document) with `idCol` named as at ingest — tf and dl are
    * per-document FACTS, so unlike df/totals they never need re-stamping
    * and the table is maintained append-style.
    */
  def readPostings(spark: SparkSession, statsDir: String,
      idCol: String): DataFrame =
    StateTables.readIfExists(spark, postingsPath(statsDir)).getOrElse {
      import spark.implicits._
      Seq.empty[(Long, Long, String, Long, Int, Long)]
        .toDF(idCol, "dl", "term", "tf", "bucket", "batch")
    }

  /** Ingest query: maintain the postings + df + totals tables from a
    * streaming doc frame. Each micro-batch writes its (term, doc, tf, dl)
    * posting rows into the touched (bucket, batch) partitions, adds its
    * per-term new-document counts into the touched df buckets
    * (read-merge-overwrite), and advances the totals row — all via
    * dynamic partition overwrite, so a foreachBatch replay rewrites the
    * same partitions instead of double-appending.
    */
  def start(docs: DataFrame, idCol: String, textCol: String, statsDir: String,
      nBuckets: Int = 16,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    docs.writeStream
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val totals = readTotals(spark, statsDir).collect()
        val (nDocs, sumDl, lastBatch) = totals.headOption
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
          .getOrElse((0L, 0L, -1L))
        if (batchId > lastBatch) { // replayed batch: already applied, skip
          val base = batch
            .select(col(idCol), Text.tokens(col(textCol)).as("__toks"))
            .persist()
          // posting rows for this batch: per-document facts, written into
          // (bucket, batch=<id>) partitions — dynamic overwrite makes a
          // replayed batch rewrite its own partitions, never double-append
          StateTables.selfMergeOverwrite(
            base.select(col(idCol), size(col("__toks")).cast("long").as("dl"),
                explode(col("__toks")).as("term"))
              .groupBy(col(idCol), col("dl"), col("term"))
              .agg(count(lit(1)).as("tf"))
              .withColumn("bucket",
                pmod(xxhash64(col("term")), lit(nBuckets.toLong)).cast("int"))
              .withColumn("batch", lit(batchId)),
            Seq("bucket", "batch"), postingsPath(statsDir))
          val delta = base
            .select(explode(array_distinct(col("__toks"))).as("term"))
            .groupBy("term").agg(count(lit(1)).as("df_delta"))
            .withColumn("bucket",
              pmod(xxhash64(col("term")), lit(nBuckets.toLong)).cast("int"))
            .persist()
          val touched = delta.select("bucket").distinct()
            .collect().map(_.getInt(0)) // O(nBuckets) driver scalars
          if (touched.nonEmpty) {
            val existing = readTermDf(spark, statsDir)
              .filter(col("bucket").isin(touched.map(Integer.valueOf): _*))
            val merged = existing
              .select(col("term"), col("doc_freq"), col("bucket"))
              .unionByName(delta.select(col("term"),
                col("df_delta").as("doc_freq"), col("bucket")))
              .groupBy("term", "bucket")
              .agg(sum("doc_freq").as("doc_freq"))
              .select(col("term"), col("doc_freq"), col("bucket"))
            StateTables.selfMergeOverwrite(merged, Seq("bucket"),
              termDfPath(statsDir))
          }
          val batchTotals = base.agg(count(lit(1)).cast("long"),
            coalesce(sum(size(col("__toks")).cast("long")), lit(0L))).head()
          import spark.implicits._
          Seq((nDocs + batchTotals.getLong(0), sumDl + batchTotals.getLong(1),
            batchId))
            .toDF("n_docs", "sum_dl", "last_batch")
            .coalesce(1)
            .write.mode("overwrite").parquet(totalsPath(statsDir))
          delta.unpersist()
          base.unpersist()
        }
        () // foreachBatch wants Unit; the guarded if-body returns a frame
      }
      .start()

  /** Score a (static) doc frame against the CURRENT persisted stats: the
    * same tf·idf the batch `Corpus.termStats` computes, with doc_freq and
    * n_docs coming from the incrementally-maintained tables. Unseen terms
    * score with doc_freq = 0 (smoothed by the +1s, same formula).
    */
  def scoreTfIdf(spark: SparkSession, statsDir: String, docs: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    val tf = docs
      .select(col(idCol), explode(Text.tokens(col(textCol))).as("term"))
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
    val df = readTermDf(spark, statsDir).select(col("term"), col("doc_freq"))
    val n = readTotals(spark, statsDir).select(col("n_docs"))
    tf.join(df, Seq("term"), "left_outer")
      .na.fill(0L, Seq("doc_freq"))
      .crossJoin(broadcast(n))
      .withColumn("tfidf", col("tf") *
        (log((col("n_docs") + 1).cast("double") / (col("doc_freq") + 1)) + 1.0))
  }

  /** BM25 against the current persisted stats (Robertson/Sparck-Jones idf,
    * same formula as the batch `Corpus.bm25Stats`).
    */
  def scoreBm25(spark: SparkSession, statsDir: String, docs: DataFrame,
      idCol: String, textCol: String,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val base = docs.select(col(idCol), Text.tokens(col(textCol)).as("__toks"))
    val tf = base
      .select(col(idCol), size(col("__toks")).cast("long").as("dl"),
        explode(col("__toks")).as("term"))
      .groupBy(col(idCol), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val df = readTermDf(spark, statsDir).select(col("term"), col("doc_freq"))
    val totals = readTotals(spark, statsDir).select(col("n_docs"), col("sum_dl"))
    val avgdl = col("sum_dl").cast("double") / col("n_docs")
    val idf = log((col("n_docs") - col("doc_freq") + 0.5) /
      (col("doc_freq") + 0.5) + 1.0)
    tf.join(df, Seq("term"), "left_outer")
      .na.fill(0L, Seq("doc_freq"))
      .crossJoin(broadcast(totals))
      .withColumn("bm25", idf * (col("tf") * (k1 + 1)) /
        (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / avgdl)))
  }

  /** Compact the per-batch posting partitions into a single `batch=-1`
    * partition per bucket. A long-running ingest accumulates one directory
    * per (bucket, batch); queries stay CORRECT regardless (the reader
    * globs every batch) but file counts grow linearly with batch count —
    * the classic streaming small-files problem. Build-aside swap: the
    * compacted layout is written next to the live one, then two FS
    * renames switch it in — a crash before the swap leaves the live table
    * untouched; the pre-compaction layout is retained as `postings_old`
    * until the next compaction for manual recovery. Call between
    * micro-batches (e.g. on a maintenance schedule); compacting while a
    * batch is mid-write would miss that batch's rows, like any
    * build-aside rebuild. Replay safety is unchanged: the batch-id stamp
    * in totals keeps foreachBatch from re-applying compacted batches.
    */
  def compactPostings(spark: SparkSession, statsDir: String): Unit = {
    val live = postingsPath(statsDir)
    StateTables.readIfExists(spark, live).foreach { posts =>
      val hconf = spark.sessionState.newHadoopConf()
      val livePath = new org.apache.hadoop.fs.Path(live)
      val fs = livePath.getFileSystem(hconf)
      val tmpPath = new org.apache.hadoop.fs.Path(live + "_compact")
      val oldPath = new org.apache.hadoop.fs.Path(live + "_old")
      posts.withColumn("batch", lit(-1L))
        .repartition(col("bucket"))
        .write.partitionBy("bucket", "batch")
        .mode("overwrite").parquet(tmpPath.toString)
      fs.delete(oldPath, true)
      if (!fs.rename(livePath, oldPath))
        throw new java.io.IOException(s"compactPostings: cannot move $live aside")
      if (!fs.rename(tmpPath, livePath)) {
        fs.rename(oldPath, livePath) // restore the live table
        throw new java.io.IOException(s"compactPostings: swap failed for $live")
      }
    }
  }

  private def withBm25(stats: DataFrame, k1: Double, b: Double): DataFrame = {
    val avgdl = col("sum_dl").cast("double") / col("n_docs")
    val idf = log((col("n_docs") - col("doc_freq") + 0.5) /
      (col("doc_freq") + 0.5) + 1.0)
    stats.withColumn("bm25", idf * (col("tf") * (k1 + 1)) /
      (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / avgdl)))
  }

  /** Reconstitute the full bm25Stats-shaped frame from the incrementally
    * maintained tables: posting rows (per-document facts) joined with the
    * CURRENT df table and broadcast totals. Equals `Corpus.bm25Stats` over
    * everything ingested so far (stream ≡ batch, asserted in
    * StreamingSpec) — the df/totals columns are corpus-global and come
    * from the maintained tables, which is exactly why postings never need
    * re-stamping when later batches shift them.
    */
  def readIndex(spark: SparkSession, statsDir: String, idCol: String,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val posts = readPostings(spark, statsDir, idCol)
      .select(col(idCol), col("dl"), col("term"), col("tf"))
    val df = readTermDf(spark, statsDir).select(col("term"), col("doc_freq"))
    val totals = readTotals(spark, statsDir).select(col("n_docs"), col("sum_dl"))
    withBm25(posts.join(df, "term").crossJoin(broadcast(totals)), k1, b)
  }

  /** Top-k BM25 search against the incrementally maintained index — the
    * streaming twin of `Corpus.searchIndex`. The query's term buckets are
    * computed driver-side with the writer's hash (O(#terms)), so both the
    * postings and df scans carry a `bucket IN (...)` partition-pruning
    * literal plus the term `isin` row-group predicate — a 3-term query
    * reads ≤ 3 bucket directories however large the ingested corpus.
    */
  def searchIndexStream(spark: SparkSession, statsDir: String, idCol: String,
      terms: Seq[String], nBuckets: Int, k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "empty query")
    import spark.implicits._
    val buckets = terms.toDF("term")
      .select(pmod(xxhash64(col("term")), lit(nBuckets.toLong))
        .cast("int").as("b"))
      .as[Int].collect().distinct.toSeq
    val posts = readPostings(spark, statsDir, idCol)
      .filter(col("bucket").isin(buckets: _*) && col("term").isin(terms: _*))
      .select(col(idCol), col("dl"), col("term"), col("tf"))
    val df = readTermDf(spark, statsDir)
      .filter(col("bucket").isin(buckets: _*) && col("term").isin(terms: _*))
      .select(col("term"), col("doc_freq"))
    val totals = readTotals(spark, statsDir).select(col("n_docs"), col("sum_dl"))
    val stats = withBm25(posts.join(df, "term").crossJoin(broadcast(totals)),
      k1, b)
    graft.functions.Corpus.scoreQuery(stats, idCol, k)
  }

  /** Query 2 of the pipeline: a stream of query documents scored per
    * micro-batch against the CURRENT stats tables (stream-static by
    * re-read, like the IVF probe stream). Results go to `sink` once per
    * batch.
    */
  def scoredStream(queryDocs: DataFrame, statsDir: String, idCol: String,
      textCol: String, sink: (DataFrame, Long) => Unit,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    queryDocs.writeStream
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        sink(scoreTfIdf(batch.sparkSession, statsDir, batch, idCol, textCol),
          batchId)
      }
      .start()
}
