package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Bounded-memory frequent-items sketch (Misra–Gries with batch
  * decrements) as a mergeable typed [[Aggregator]].
  *
  * [[graft.functions.Corpus.heavyHitters]] is exact but shuffles the full
  * distinct vocabulary — right for word tokens, impossible for n-grams at
  * corpus scale (the distinct 5-gram set of a 100 TB corpus is itself
  * TB-sized). This sketch keeps at most `capacity` counters per partition
  * and merges them associatively, so the job is ONE pass, O(capacity)
  * memory anywhere, and nothing but summaries crosses the shuffle.
  *
  * Guarantees (classic Misra–Gries, preserved by the summed-merge of
  * Agarwal et al., "Mergeable Summaries", PODS'12):
  *   - reported count ∈ [true − N/capacity, true] (undercount only),
  *     where N = total item count;
  *   - every item with true frequency > N/capacity is in the summary —
  *     no false negatives above the error floor;
  *   - with capacity ≥ #distinct items no decrement ever fires and counts
  *     are EXACT (the regime the oracle gate pins).
  *
  * Implementation note: instead of the textbook decrement-all-on-miss
  * (O(capacity) per new key, quadratic on all-distinct input) the buffer
  * grows to 2×capacity and then subtracts the (capacity+1)-th largest
  * count from everything — the same bound, amortized O(1) map ops per
  * element.
  */
object FrequentItems {

  private def trim(m: Map[String, Long], cap: Int): Map[String, Long] =
    if (m.size <= cap) m
    else {
      val kth = m.valuesIterator.toArray.sortBy(-_).apply(cap)
      m.collect { case (t, c) if c > kth => t -> (c - kth) }
    }

  private final class MGAgg(capacity: Int)
      extends Aggregator[String, Map[String, Long], Map[String, Long]] {
    require(capacity >= 1, s"capacity must be >= 1, got $capacity")
    private val soft = capacity * 2

    def zero: Map[String, Long] = Map.empty
    def reduce(buf: Map[String, Long], tok: String): Map[String, Long] = {
      val b = buf.updatedWith(tok) { c => Some(c.getOrElse(0L) + 1L) }
      if (b.size > soft) trim(b, capacity) else b
    }
    def merge(b1: Map[String, Long], b2: Map[String, Long]): Map[String, Long] = {
      val summed = b2.foldLeft(b1) { case (acc, (t, c)) =>
        acc.updatedWith(t)(old => Some(old.getOrElse(0L) + c))
      }
      trim(summed, capacity)
    }
    def finish(r: Map[String, Long]): Map[String, Long] = trim(r, capacity)
    def bufferEncoder: ExpressionEncoder[Map[String, Long]] =
      ExpressionEncoder[Map[String, Long]]()
    def outputEncoder: ExpressionEncoder[Map[String, Long]] =
      ExpressionEncoder[Map[String, Long]]()
  }

  /** The sketch as an aggregate Column (item → approx count map), usable
    * in batch and streaming aggregations alike — the buffer is a
    * TypedImperativeAggregate, so Structured Streaming persists and merges
    * it across micro-batches in the state store.
    */
  def sketch(itemCol: Column, capacity: Int): Column = {
    val agg = udaf(new MGAgg(capacity), ExpressionEncoder[String]())
    agg(itemCol.cast("string"))
  }

  /** Aggregate an exploded item column into a frequency summary, then
    * return the top `k` by sketched count (count desc, item asc —
    * deterministic whenever the counts themselves are, i.e. always in the
    * exact regime). Output: item, approx_n.
    */
  def topKSketch(df: DataFrame, itemCol: Column, capacity: Int, k: Int): DataFrame =
    df.select(itemCol.cast("string").as("__item"))
      .filter(col("__item").isNotNull)
      .agg(sketch(col("__item"), capacity).as("__summary"))
      .select(explode(col("__summary")).as(Seq("item", "approx_n")))
      .orderBy(col("approx_n").desc, col("item").asc)
      .limit(k)
}
