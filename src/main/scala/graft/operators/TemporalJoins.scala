package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal joins Spark's built-in operators don't express directly:
  * as-of join ("most recent right row at or before each left row") and
  * point-in-range join — both named by the brief as the custom-operator
  * showcase, both realized as compositions whose physical plans are
  * shuffle-bounded (never a per-row subquery, never a nested-loop join).
  *
  * The reference has neither (its join surface is equi-key only,
  * thrill/api/inner_join.hpp) — training-data superset operators.
  */
object TemporalJoins {

  /** Backward as-of join: every `left` row picks the `right` row with the
    * same key and the greatest `rightTime` <= `leftTime` (inclusive, the
    * pandas `merge_asof` default); unmatched left rows keep null right
    * columns (left-outer semantics). `toleranceSec` additionally nulls
    * matches older than the given horizon (timestamp columns only).
    *
    * NOT expressible as a Spark join without a cross-product or per-row
    * aggregation: implemented instead as the union trick — tag both sides,
    * sort by (key, time, side) with right rows first at equal times, and
    * carry the latest right payload forward with a running
    * `last(ignoreNulls)` window. Physical plan: ONE shuffle (the window's
    * hash partitioning on the key), no Join operator at all; the running
    * frame (unboundedPreceding → currentRow) is Spark's incremental O(1)/
    * row aggregate, so the whole op is sort + linear scan per key — the
    * same shape at 100 TB with 10⁹ keys.
    *
    * The right payload travels as ONE nullable struct so "no match yet" is
    * distinguishable from legitimate nulls inside right columns.
    * Determinism contract: `right` must be unique per (keys, rightTime) —
    * ties inside one timestamp have no defined "most recent" (same
    * contract as DuckDB/pandas as-of).
    */
  def asofJoinBackward(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String,
      toleranceSec: Option[Long] = None): DataFrame = {
    require(keys.nonEmpty, "asofJoinBackward needs at least one equi key")
    val leftPay = left.columns.filterNot(keys.contains).toSeq
    val rightPay = right.columns.filterNot(keys.contains).toSeq
    val clash = leftPay.toSet.intersect(rightPay.toSet)
    require(clash.isEmpty,
      s"rename clashing non-key columns before joining: ${clash.mkString(", ")}")
    val lType = left.select(struct(leftPay.map(col): _*)).schema.head.dataType
    val rType = right.select(struct(rightPay.map(col): _*)).schema.head.dataType
    val unioned = left.select(
        keys.map(col) ++ Seq(col(leftTime).as("__t"), lit(1).as("__side"),
          struct(leftPay.map(col): _*).as("__lpay"),
          lit(null).cast(rType).as("__r")): _*)
      .unionByName(right.select(
        keys.map(col) ++ Seq(col(rightTime).as("__t"), lit(0).as("__side"),
          lit(null).cast(lType).as("__lpay"),
          struct(rightPay.map(col): _*).as("__r")): _*))
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = unioned
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    val withTol = toleranceSec.fold(matched) { tol =>
      matched.withColumn("__m",
        when(col("__m").isNotNull &&
            unix_micros(col("__t")) -
              unix_micros(col("__m").getField(rightTime)) <= tol * 1000000L,
          col("__m")).otherwise(lit(null).cast(rType)))
    }
    withTol.select(
      keys.map(col) ++
        leftPay.map(c => col("__lpay").getField(c).as(c)) ++
        rightPay.map(c => col("__m").getField(c).as(c)): _*)
  }

  /** Stream-compatible backward as-of join against a STATIC right side:
    * the right table is collapsed to one row per key holding its
    * time-sorted (rightTime, payload…) structs, equi-joined onto the left
    * (stream-static joins are supported; the union+window form is not
    * streamable — a global sort has no watermark), and the match is
    * `element_at(filter(arr, e -> e.t <= t), -1)` — all Catalyst
    * higher-order functions, no UDF, no state store.
    *
    * Contract: the right side must be per-key row-sized (dimension
    * snapshots, rate tables — the static-side shape this exists for);
    * a right key with 10⁸ rows belongs in [[asofJoinBackward]]. Lookup is
    * O(right rows per key) per left row; same output convention and
    * tolerance semantics as [[asofJoinBackward]], stream ≡ batch asserted
    * in StreamingSpec.
    */
  def asofJoinStreamStatic(left: DataFrame, right: DataFrame,
      keys: Seq[String], leftTime: String, rightTime: String,
      toleranceSec: Option[Long] = None): DataFrame = {
    require(keys.nonEmpty, "asofJoinStreamStatic needs at least one equi key")
    val leftPay = left.columns.filterNot(keys.contains).toSeq
    val rightPay = right.columns.filterNot(keys.contains).toSeq
    val clash = leftPay.toSet.intersect(rightPay.toSet)
    require(clash.isEmpty,
      s"rename clashing non-key columns before joining: ${clash.mkString(", ")}")
    val rType = right.select(struct(rightPay.map(col): _*)).schema.head.dataType
    val packed = right.groupBy(keys.map(col): _*)
      .agg(sort_array(collect_list(
        struct(col(rightTime).as("__rt"), struct(rightPay.map(col): _*).as("__p"))))
        .as("__arr"))
    val joined = left.join(packed, keys, "left")
    // try_element_at: ANSI-safe — empty/missing array yields null (a plain
    // element_at(-1) throws under ANSI when the filtered array is empty)
    val m0 = try_element_at(
      filter(col("__arr"), e => e.getField("__rt") <= col(leftTime)), lit(-1))
      .getField("__p")
    val m = toleranceSec.fold(m0) { tol =>
      when(unix_micros(col(leftTime)) -
          unix_micros(m0.getField(rightTime)) <= tol * 1000000L, m0)
        .otherwise(lit(null).cast(rType))
    }
    joined.select(
      keys.map(col) ++ leftPay.map(col) ++
        rightPay.map(c => m.getField(c).as(c)): _*)
  }

  /** Floor-division bucket index, exact for any long (decimal arithmetic —
    * no double rounding, floor handles negative values correctly).
    */
  private def bucketOf(c: Column, width: Long): Column =
    floor(c.cast("decimal(38,6)") / lit(width)).cast("long")

  /** Point-in-range join: each `points` row pairs with every `ranges` row
    * sharing its keys with `loCol` <= `pointCol` <= `hiCol`. Point/lo/hi
    * are LONG columns (convert timestamps with `unix_micros` first).
    *
    * A naive non-equi join plans as BroadcastNestedLoop/cartesian — the
    * scale killer. Here ranges are replicated to the fixed-width buckets
    * they overlap (`sequence(floor(lo/W), floor(hi/W))` → explode), points
    * carry their single bucket, and the join is a plain equi-join on
    * (keys…, bucket) plus the residual between-filter. A point's bucket is
    * unique, so each qualifying (point, range) pair meets exactly once —
    * no distinct needed. Cost: ranges blow up by span/W (pick `bucketWidth`
    * near the typical span; per-range replication is capped loudly at
    * `maxBucketsPerRange`), the join key (keys…, bucket) is
    * high-cardinality → well-spread shuffle, AQE handles stragglers.
    *
    * Stream-compatible on the points side: with streaming `points` and
    * static `ranges` the plan is a stream-static equi-join plus a
    * row-local residual filter — no state store, no watermark (stream ≡
    * batch asserted in StreamingSpec).
    */
  def rangeJoin(points: DataFrame, ranges: DataFrame, pointCol: String,
      loCol: String, hiCol: String, bucketWidth: Long,
      keys: Seq[String] = Nil,
      maxBucketsPerRange: Int = 100000): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val clash = points.columns.filterNot(keys.contains).toSet
      .intersect(ranges.columns.filterNot(keys.contains).toSet)
    require(clash.isEmpty,
      s"rename clashing non-key columns before joining: ${clash.mkString(", ")}")
    val lo = bucketOf(col(loCol), bucketWidth)
    val hi = bucketOf(col(hiCol), bucketWidth)
    val guarded = when(hi - lo >= maxBucketsPerRange,
      raise_error(concat(lit(s"rangeJoin: a range spans >= $maxBucketsPerRange " +
        s"buckets at width $bucketWidth — raise bucketWidth (range ["),
        col(loCol), lit(", "), col(hiCol), lit("])")))).otherwise(hi)
    val rb = ranges.withColumn("__bucket", explode(sequence(lo, guarded)))
    val pb = points.withColumn("__bucket", bucketOf(col(pointCol), bucketWidth))
    pb.join(rb, keys :+ "__bucket")
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__bucket")
  }
}
