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
