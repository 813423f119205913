package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated test tables (TESTDATA.md). Each call is
  * a plain parquet scan — Catalyst pushes filters/column pruning into it, so
  * callers should NOT cache or materialize here. At cluster scale these
  * would be external-catalog tables; the indirection point is this object.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  /** The events table's `ts` physical type has drifted across testdata
    * generations (TIMESTAMP(NANOS) in one, timestamp[us] in another), so the
    * loader adapts to whatever the footer declares instead of assuming one:
    *   - TIMESTAMP(NANOS): Spark's reader rejects it outright, so the
    *     nanosAsLong legacy conf maps it to BIGINT epoch-nanos, which we
    *     convert with exact integer division (no double round-trip — a
    *     double mantissa can't hold an epoch-nanos value).
    *   - timestamp[us] without tz: reads back as TIMESTAMP_NTZ; cast to the
    *     session-zone TIMESTAMP (sessions here run UTC, so the instant is
    *     unchanged and downstream window/date functions behave identically).
    * The conf is harmless for non-nanos files — it only affects NANOS columns.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = load(s, d, "events")
    df.schema("ts").dataType match {
      case LongType         => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast("timestamp"))
      case _                => df
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
