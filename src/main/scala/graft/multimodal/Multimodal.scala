package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Typed metadata extracted from an opaque media blob. */
case class MediaMeta(
    doc_id: Long,
    kind: String,
    n_bytes: Long,
    width: Int,
    height: Int,
    checksum: Long)

/** Multimodal column plumbing: image/audio/video travel as opaque `binary`
  * columns with typed metadata alongside. The Spark-side mechanics —
  * schema, partition-preserving batch iteration, feature signature — are
  * real and tested; the actual codec step is STUBBED (this container ships
  * no image/audio libraries) behind `decodeStub`, which derives
  * deterministic pseudo-features from the bytes so tests are stable.
  */
object Multimodal {

  /** Wrap a text column as fake media bytes (binary column). In production
    * this column would come from `spark.read.format("binaryFile")` or a
    * parquet `binary` field.
    */
  def packMedia(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).cast("long").as("doc_id"),
      encode(col(textCol), "UTF-8").as("media"),
      lit("image/fake").as("kind"))

  /** "Decode" each blob into typed MediaMeta, batched per partition — the
    * same shape a real decoder (mapInPandas / mapPartitions with a native
    * codec) would use: one iterator pass, no per-row session setup, output
    * is a typed Dataset so downstream stays columnar.
    *
    * STUB: width/height/checksum are derived deterministically from the
    * byte content instead of an actual image decode (`???` would be the
    * codec call). Swap `fakeDecode` for the real library at deployment.
    */
  def decodeStub(df: DataFrame)(implicit spark: SparkSession): Dataset[MediaMeta] = {
    import spark.implicits._
    df.select(col("doc_id"), col("media"), col("kind"))
      .as[(Long, Array[Byte], String)]
      .mapPartitions { it =>
        it.map { case (id, bytes, kind) =>
          fakeDecode(id, bytes, kind)
        }
      }
  }

  /** Deterministic stand-in for the codec: a real implementation would be
    * e.g. `ImageIO.read(new ByteArrayInputStream(bytes))`.
    */
  private def fakeDecode(id: Long, bytes: Array[Byte], kind: String): MediaMeta = {
    var crc = 0L
    var i = 0
    while (i < bytes.length) { crc = crc * 31L + (bytes(i) & 0xff); i += 1 }
    val w = 64 + (math.abs(crc) % 577).toInt // pseudo "decoded" dimensions
    val h = 64 + (math.abs(crc >> 17) % 421).toInt
    MediaMeta(id, kind, bytes.length.toLong, w, h, crc)
  }

  /** Frame sampling for video-like blobs: 1→N expansion where each blob
    * emits every `stride`-th "frame". The Spark-side shape is the real
    * thing — a flatMap-style partition iterator producing multiple typed
    * rows per input blob, so frame rows distribute across downstream
    * partitions instead of clustering per video. STUB: frames are fixed
    * 4 KiB byte slices; a real decoder would demux the container here.
    */
  def frameSample(df: DataFrame, stride: Int)(
      implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    require(stride >= 1, s"stride must be >= 1, got $stride")
    val frameBytes = 4096
    df.select(col("doc_id"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          // ceil division: the partial tail frame is emitted, not dropped
          val nFrames = math.max(1, (bytes.length + frameBytes - 1) / frameBytes)
          (0 until nFrames by stride).iterator.map { f =>
            val from = f * frameBytes
            val until = math.min(bytes.length, from + frameBytes)
            (id, f, java.util.Arrays.copyOfRange(bytes, from, until))
          }
        }
      }
      .toDF("doc_id", "frame_no", "frame")
  }

  /** Resize plumbing: binary in → binary out, same batched partition
    * iteration as decodeStub. STUB: truncation stands in for scaling.
    */
  def resizeStub(df: DataFrame, maxBytes: Int)(
      implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    df.select(col("doc_id"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        (id, if (bytes.length <= maxBytes) bytes
             else java.util.Arrays.copyOf(bytes, maxBytes))
      })
      .toDF("doc_id", "media")
  }

  /** Example end-to-end: pack → decode → aggregate feature stats. */
  def mediaStats(df: DataFrame, idCol: String, textCol: String)(
      implicit spark: SparkSession): DataFrame = {
    decodeStub(packMedia(df, idCol, textCol))
      .groupBy(col("kind"))
      .agg(count(lit(1)).as("n"),
        sum(col("n_bytes")).as("total_bytes"),
        avg(col("width")).as("avg_width"))
  }
}
