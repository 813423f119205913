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

  /** Candidate near-dup pairs from a streaming DataFrame with `idCol` and
    * `textCol`. Pairs are normalized (id_a < id_b); each new doc pairs
    * with the docs already stored for any shared (band, bucket).
    */
  def nearDupCandidates(docs: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 96, bands: Int = 24, shingleSize: Int = 2,
      bucketCap: Int = 64, stateTtl: String = "2 hours"): Dataset[CandPair] = {
    import docs.sparkSession.implicits._
    val bt = Dedup.minhashBands(docs, idCol, textCol, numHashes, bands, shingleSize)
    bt.select(col("band").cast("int"), col("bucket"),
        col(idCol).cast("long"))
      .as[(Int, Long, Long)]
      .groupByKey(r => (r._1, r._2))
      .flatMapGroupsWithState[BucketState, CandPair](
          OutputMode.Append(), GroupStateTimeout.ProcessingTimeTimeout) {
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
              if (!stored.contains(d) && stored.size < bucketCap) {
                stored.foreach { s =>
                  out += (if (s < d) CandPair(s, d) else CandPair(d, s))
                }
                stored = d :: stored
              }
            }
            state.update(BucketState(stored))
            state.setTimeoutDuration(stateTtl)
            out.iterator
          }
      }
  }
}
