package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for hot-keyed shuffles at 100 TB.
  *
  * First lines of defense are declarative: AQE's skew-join split
  * (`spark.sql.adaptive.skewJoin.enabled`, on by default here) rebalances
  * oversized sort-merge-join partitions at runtime, and partial
  * aggregation bounds groupBy shuffle volume by distinct-key count. The
  * explicit salting below is for the cases AQE cannot rewrite — e.g. a
  * shuffled hash join against a dimension too big to broadcast but small
  * enough to replicate `salt`× , or a deliberate pre-spread before a typed
  * operation.
  */
object Skew {

  /** Inner equi-join with the hot side salted: each fact row draws a
    * uniform salt in [0, salt), the dimension side is replicated once per
    * salt value, and the join key becomes (key, __salt) — spreading every
    * hot key across `salt` shuffle partitions. Result equals
    * `fact.join(dim, key)` exactly (asserted in tests); shuffle volume of
    * the dim side grows by `salt`×, the fact side not at all.
    */
  /** Deterministic per-row salt: a hash of the full row content. Must NOT
    * be rand()/monotonically_increasing_id() — non-deterministic
    * expressions re-evaluate differently when a task retries after a
    * shuffle-fetch failure, duplicating or dropping rows (the SPARK-23207
    * class of bug). Identical duplicate rows share a salt bucket, which is
    * correct (just slightly less spread for exact-duplicate-heavy data).
    */
  private def rowSalt(df: DataFrame, salt: Int) =
    pmod(hash(df.columns.map(col): _*), lit(salt))

  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String, salt: Int): DataFrame = {
    require(salt >= 1, s"salt must be >= 1, got $salt")
    val saltedFact = fact.withColumn("__salt", rowSalt(fact, salt))
    val saltedDim = dim.withColumn("__salt",
      explode(array((0 until salt).map(lit): _*)))
    saltedFact.join(saltedDim, Seq(key, "__salt")).drop("__salt")
  }

  /** Two-phase salted aggregation for holistic aggregates whose partial
    * form Catalyst cannot split itself (e.g. collect_list volume control,
    * exact distinct counts over a hot key). Phase 1 aggregates on
    * (key, salt), phase 2 merges the per-salt partials — the hot key's
    * work is spread over `salt` tasks in phase 1, and phase 2 touches only
    * |keys|·salt pre-aggregated rows.
    *
    * `partials` aggregate within a salt bucket; `merges` combine buckets.
    * Both lists are (aggExpr, outputName) so phase 2 can reference phase-1
    * columns by name.
    */
  def saltedAgg(df: DataFrame, key: String, salt: Int,
      partials: Seq[(org.apache.spark.sql.Column, String)],
      merges: Seq[(org.apache.spark.sql.Column, String)]): DataFrame = {
    require(salt >= 1, s"salt must be >= 1, got $salt")
    require(partials.nonEmpty && merges.nonEmpty,
      "saltedAgg needs at least one partial and one merge aggregate")
    val salted = df.withColumn("__salt", rowSalt(df, salt))
    val phase1 = salted.groupBy(col(key), col("__salt"))
      .agg(partials.head._1.as(partials.head._2),
        partials.tail.map { case (c, n) => c.as(n) }: _*)
    phase1.groupBy(col(key))
      .agg(merges.head._1.as(merges.head._2),
        merges.tail.map { case (c, n) => c.as(n) }: _*)
  }
}
