package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

import scala.collection.mutable.ArrayBuffer

import graft.functions.Dedup

/** Streaming near-duplicate detection over a document stream — the
  * streaming twin of the batch MinHash+LSH path (`Dedup.minhashBands` /
  * `lshCandidatePairs`). The signature/banding computation is the exact
  * same code (pure per-row expressions, streaming-safe); candidate
  * generation swaps the batch self-join for keyed state: one bucket =
  * one state entry holding the doc ids seen in that bucket.
  *
  * Scale posture: state is O(#active buckets × bucketCap) ids, expired by
  * a ProcessingTime TTL; a degenerate bucket stops accumulating (and
  * emitting) at `bucketCap`, the streaming analog of the batch
  * bucket-size cap — both bound the quadratic pair blowup. Emitted pairs
  * can repeat across bands/batches; consumers dedup (or batch-verify
  * with exact jaccard) downstream, as the batch path does.
  */
object DocStream {

  case class BucketState(docIds: List[Long])
  case class CandPair(id_a: Long, id_b: Long)

  /** Exact-jaccard verification + first-wins DROP decision over a
    * candidate-pair stream — query 2 of the two-query streaming dedup
    * pipeline (query 1 is [[nearDupCandidates]] writing its pairs to a
    * file sink; chaining a second stateful operator after
    * flatMapGroupsWithState in ONE query is not supported, so the
    * composition point is the sink).
    *
    * `corpus` is a STATIC frame over the already-ingested documents
    * (stream-static join — every candidate id was emitted by query 1, so
    * it exists in the corpus the moment the pair does). Shingle sets are
    * joined onto the candidate pairs only, exact jaccard filters at
    * `threshold`, and each surviving pair drops its HIGHER id (id_b) —
    * the batch `Dedup.nearDupKeepCorpus` drop policy. `dropDuplicates`
    * emits each dropped id once; its state is O(#dropped ids) — bound it
    * with an ingest-time watermark column upstream if the stream is
    * unbounded. Kept corpus = ingested docs anti-joined with this output.
    */
  def verifiedDrops(cands: DataFrame, corpus: DataFrame, idCol: String,
      textCol: String, threshold: Double, shingleSize: Int = 2): DataFrame =
    verifyCore(cands, corpus, idCol, textCol, threshold, shingleSize)
      .select(col("id_b").as("drop_id"))
      .dropDuplicates("drop_id")

  /** Shared exact-jaccard verification of candidate pairs against the
    * static corpus — no dedup here, so each consumer adds exactly ONE
    * stateful operator to its streaming query (chaining two
    * `dropDuplicates` in one query is a mode/stateful-chain hazard).
    */
  private def verifyCore(cands: DataFrame, corpus: DataFrame, idCol: String,
      textCol: String, threshold: Double, shingleSize: Int): DataFrame = {
    import graft.functions.Text
    val sets = corpus.select(col(idCol),
      Text.shinglesOfTokens(Text.tokens(col(textCol)), shingleSize).as("ws"))
    val withA = cands.join(
      sets.select(col(idCol).as("id_a"), col("ws").as("ws_a")), "id_a")
    val withB = withA.join(
      sets.select(col(idCol).as("id_b"), col("ws").as("ws_b")), "id_b")
    val inter = size(array_intersect(col("ws_a"), col("ws_b"))).cast("double")
    val uni = (size(col("ws_a")) + size(col("ws_b"))).cast("double") - inter
    withB.filter(inter / uni >= threshold)
      .select(col("id_a"), col("id_b"))
  }

  /** Exact-jaccard VERIFIED PAIRS over a candidate-pair stream — the
    * cluster-policy sibling of [[verifiedDrops]] (which bakes in the
    * pairwise first-wins drop). Emits each verified (id_a, id_b) once;
    * the pairs accumulate at a file sink, and
    * `Dedup.clustersFromPairs(corpus, idCol, sinkPairs)` relabels the
    * accumulated graph with connected components whenever the pipeline
    * wants fresh clusters (CC is iterative — it runs over the sink, not
    * inside the streaming query; stream ≡ batch asserted in
    * StreamingSpec). `dropDuplicates` state is O(#verified pairs) —
    * bound with an ingest-time watermark upstream on unbounded streams.
    */
  def verifiedPairs(cands: DataFrame, corpus: DataFrame, idCol: String,
      textCol: String, threshold: Double, shingleSize: Int = 2): DataFrame =
    verifyCore(cands, corpus, idCol, textCol, threshold, shingleSize)
      .dropDuplicates("id_a", "id_b")

  /** Candidate near-dup pairs from a streaming DataFrame with `idCol` and
    * `textCol`. Pairs are normalized (id_a < id_b); each new doc pairs
    * with the docs already stored for any shared (band, bucket).
    *
    * State lifetime: TTL is OPT-IN (same contract as
    * EventStream.sessionize) — by default bucket state is kept forever,
    * and a finite run (Trigger.AvailableNow) terminates as soon as the
    * input is drained. Production ingest on an unbounded corpus should
    * pass `stateTtl = Some(...)`: a ProcessingTime timeout then expires
    * idle buckets, bounding state — with the documented tradeoff that a
    * near-dup arriving after its bucket expired is not paired (and note
    * that with timeouts armed, AvailableNow keeps scheduling
    * timeout-check batches until pending timeouts fire).
    *
    * Recall observability: a doc arriving at a FULL bucket is neither
    * paired nor stored — silent recall loss if it happens often. Pass
    * `saturationCounter` (a driver-registered LongAccumulator) and every
    * such drop increments it, so production can alert on saturated
    * buckets instead of discovering the loss downstream.
    */
  def nearDupCandidates(docs: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 96, bands: Int = 24, shingleSize: Int = 2,
      bucketCap: Int = 64, stateTtl: Option[String] = None,
      saturationCounter: Option[org.apache.spark.util.LongAccumulator] = None)
      : Dataset[CandPair] = {
    import docs.sparkSession.implicits._
    val timeoutConf = if (stateTtl.isDefined)
      GroupStateTimeout.ProcessingTimeTimeout else GroupStateTimeout.NoTimeout
    val bt = Dedup.minhashBands(docs, idCol, textCol, numHashes, bands, shingleSize)
    bt.select(col("band").cast("int"), col("bucket"),
        col(idCol).cast("long"))
      .as[(Int, Long, Long)]
      .groupByKey(r => (r._1, r._2))
      .flatMapGroupsWithState[BucketState, CandPair](
          OutputMode.Append(), timeoutConf) {
        (_, it, state) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var stored = state.getOption.map(_.docIds).getOrElse(Nil)
            // sorted for deterministic pair emission within a batch
            val newDocs = it.map(_._3).toArray.distinct.sorted
            val out = new ArrayBuffer[CandPair]()
            newDocs.foreach { d =>
              if (!stored.contains(d)) {
                if (stored.size < bucketCap) {
                  stored.foreach { s =>
                    out += (if (s < d) CandPair(s, d) else CandPair(d, s))
                  }
                  stored = d :: stored
                } else {
                  // full bucket: doc dropped from this band's candidates
                  saturationCounter.foreach(_.add(1L))
                }
              }
            }
            state.update(BucketState(stored))
            stateTtl.foreach(state.setTimeoutDuration)
            out.iterator
          }
      }
  }

  /** Streaming corpus diff: an incremental crawl snapshot streams in and
    * is compared against the STATIC previous snapshot — each arriving
    * document is emitted as `added` (id unseen in the old corpus) or
    * `changed` (normalized-text fingerprint differs), unchanged documents
    * are dropped in-plan. The stream-static left-outer join is stateless
    * on the stream side (the static side broadcasts or hash-joins per
    * micro-batch), so there is no state-store growth.
    *
    * `removed` is NOT streamable: a document's absence is only known when
    * the snapshot is complete, so the batch `Corpus.corpusDiff` runs that
    * final reconciliation (old anti-join new) once ingestion finishes —
    * the same split as the near-dup pipeline's candidates-now /
    * verify-at-sink design.
    */
  def diffStream(newSnap: DataFrame, oldSnap: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    import graft.functions.Text
    // explicit presence marker + null-safe compare, matching the batch
    // corpusDiff: a null-text document exists (null fingerprint ≠ absent)
    val o = oldSnap.select(col(idCol),
      Text.fingerprint(col(textCol)).as("__fp_old"), lit(true).as("__in_old"))
    newSnap
      .select(col(idCol), Text.fingerprint(col(textCol)).as("__fp_new"))
      .join(o, Seq(idCol), "left_outer")
      .select(col(idCol),
        when(col("__in_old").isNull, "added")
          .when(!(col("__fp_old") <=> col("__fp_new")), "changed")
          .as("status"))
      .filter(col("status").isNotNull)
  }

  /** Streaming frequent n-grams: the Misra–Gries sketch as an incremental
    * aggregate over a document stream (Complete/Update output). The sketch
    * buffer is a TypedImperativeAggregate, so the state store holds ONE
    * O(capacity) summary and merges each micro-batch's partials into it —
    * the streaming twin of `FrequentItems.topKSketch`, same exactness
    * regime (capacity ≥ #distinct ⇒ counts exact), asserted stream≡batch
    * across multiple micro-batches in StreamingSpec. Output: a single row
    * holding the item→count summary map (consumers explode + top-k; a
    * generate after a streaming aggregate is mode-restricted, so the
    * explode stays on the consumer side).
    */
  def freqNgramsStream(docs: DataFrame, textCol: String, n: Int,
      capacity: Int): DataFrame = {
    import graft.functions.Text
    docs.select(Text.tokens(col(textCol)).as("__toks"))
      .select(explode(Text.shinglesOfTokens(col("__toks"), n)).as("gram"))
      .agg(graft.operators.FrequentItems.sketch(col("gram"), capacity)
        .as("summary"))
  }
}
