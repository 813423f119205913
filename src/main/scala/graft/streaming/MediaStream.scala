package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.multimodal.{AudioMeta, ImageMeta, MediaMeta, Multimodal}
import graft.functions.Similarity

/** Streaming twins for the multimodal and embedding paths — the third and
  * final data modality of the streaming superset (events and documents are
  * covered by EventStream / DocStream). The reference is strictly batch
  * (SURVEY.md §2.9); these are declared superset capability.
  *
  * The multimodal operators (`Multimodal.packMedia/decodeStub/frameSample/
  * resizeStub`) are STATELESS per-partition transforms, so the exact batch
  * code runs unchanged on a streaming DataFrame — asserted stream≡batch in
  * StreamingSpec rather than re-implemented here. What this module adds is
  * the composition surface: ingest → decode → per-kind stats as an
  * incremental aggregate, and a query stream probed against a PERSISTED
  * IVF index (build once statically, probe every micro-batch — the
  * streaming form of build-once/search-many).
  */
object MediaStream {

  /** Ingest a documents directory as a stream and decode each blob to
    * typed MediaMeta. Identical plan to the batch
    * `decodeStub(packMedia(...))` — stateless, so Append-mode safe.
    */
  def decodeStream(docs: DataFrame, idCol: String, textCol: String)(
      implicit spark: SparkSession): Dataset[MediaMeta] =
    Multimodal.decodeStub(Multimodal.packMedia(docs, idCol, textCol))

  /** Incremental per-kind media stats — the streaming twin of
    * `Multimodal.mediaStats`. Unwindowed running aggregate (media blobs
    * carry no event time): state is O(#kinds) rows, Complete/Update
    * output. A time-bounded deployment would add an ingest-time column +
    * watermark upstream.
    */
  def mediaStatsStream(docs: DataFrame, idCol: String, textCol: String)(
      implicit spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.functions._
    decodeStream(docs, idCol, textCol)
      .groupBy(col("kind"))
      .agg(count(lit(1)).as("n"),
        sum(col("n_bytes")).as("total_bytes"),
        avg(col("width")).as("avg_width"))
  }

  /** REAL image-decode stream: encode each arriving id to actual PNG/JPEG
    * container bytes and decode them back with JDK `ImageIO`
    * ([[Multimodal.packImages]] → [[Multimodal.decodeImages]]). Both are
    * stateless partition maps, so the exact batch code runs unchanged on a
    * streaming DataFrame (Append-mode safe) — asserted stream≡batch in
    * StreamingSpec. In production the pack stage is replaced by
    * `readStream.format("binaryFile")` or a parquet binary column.
    */
  def imageDecodeStream(ids: DataFrame, idCol: String)(
      implicit spark: SparkSession): Dataset[ImageMeta] =
    Multimodal.decodeImages(Multimodal.packImages(ids, idCol))

  /** REAL audio-decode stream: WAV fixtures encoded and decoded back with
    * JDK `javax.sound` ([[Multimodal.packAudio]] →
    * [[Multimodal.decodeAudio]]), stateless, Append-safe — same contract
    * as [[imageDecodeStream]].
    */
  def audioDecodeStream(ids: DataFrame, idCol: String)(
      implicit spark: SparkSession): Dataset[AudioMeta] =
    Multimodal.decodeAudio(Multimodal.packAudio(ids, idCol))

  /** REAL video-demux stream: MJPEG-AVI fixtures encoded and RIFF-walked
    * back to per-frame JPEG rows ([[Multimodal.packVideo]] →
    * [[Multimodal.demuxVideo]]) — a stateless 1→N partition flatMap, so
    * the exact batch code runs unchanged on a streaming DataFrame
    * (Append-safe) — same contract as [[imageDecodeStream]]. In production
    * the pack stage is replaced by `readStream.format("binaryFile")` over
    * an AVI drop directory.
    */
  def videoDemuxStream(ids: DataFrame, idCol: String)(
      implicit spark: SparkSession): DataFrame =
    Multimodal.demuxVideo(Multimodal.packVideo(ids, idCol))

  /** Audio-segmentation stream: WAV fixtures sliced into overlapping
    * PCM windows ([[Multimodal.packAudio]] → [[Multimodal.chunkAudio]]) —
    * stateless 1→N partition flatMap, Append-safe, same contract as
    * [[imageDecodeStream]].
    */
  def audioChunkStream(ids: DataFrame, idCol: String, chunkFrames: Int,
      strideFrames: Int)(implicit spark: SparkSession): DataFrame =
    Multimodal.chunkAudio(Multimodal.packAudio(ids, idCol), chunkFrames,
      strideFrames)

  /** Image-patch stream: ViT-style patch grid over decoded rasters
    * ([[Multimodal.packImages]] → [[Multimodal.patchImages]]) — stateless
    * 1→N partition flatMap, Append-safe.
    */
  def imagePatchStream(ids: DataFrame, idCol: String, pSize: Int)(
      implicit spark: SparkSession): DataFrame =
    Multimodal.patchImages(Multimodal.packImages(ids, idCol), pSize)

  /** Frame-sampled stream: 1→N frame expansion per blob, stateless. */
  def frameStream(docs: DataFrame, idCol: String, textCol: String,
      stride: Int)(implicit spark: SparkSession): DataFrame =
    Multimodal.frameSample(Multimodal.packMedia(docs, idCol, textCol), stride)

  /** Probe a stream of query vectors against a PERSISTED IVF index
    * ([[Similarity.ivfWrite]] builds it; this is the streaming
    * search-many side). Composition is `foreachBatch`: each micro-batch's
    * query set is collected to the driver (documented O(batchRows·dim) —
    * the same "queries are small, corpus is big" contract as the batch
    * search) and answered with [[Similarity.ivfSearch]], which carries the
    * `ivf_cell IN (...)` literal filter → static partition pruning, so a
    * micro-batch reads only its probed cells' files no matter how large
    * the indexed corpus is. Results go to `sink` exactly once per batch
    * (foreachBatch re-delivery on failure follows Spark's usual
    * at-least-once sink contract).
    *
    * `queryStream` columns: (query_id long, q_vec array<float>).
    */
  def ivfProbeStream(queryStream: DataFrame, indexPath: String, k: Int,
      nProbe: Int, sink: (DataFrame, Long) => Unit,
      trigger: Trigger = Trigger.AvailableNow(),
      idCol: String = "vec_id", vecCol: String = "embedding"): StreamingQuery =
    queryStream.writeStream
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val queries = batch.collect().map { r =>
          (r.getLong(0), r.getSeq[Float](1).toArray)
        }.toSeq
        if (queries.nonEmpty)
          sink(Similarity.ivfSearch(spark, indexPath, queries, k, nProbe,
            idCol, vecCol), batchId)
      }
      .start()
}
