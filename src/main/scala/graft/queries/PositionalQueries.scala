package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.dia.DIA
import graft.operators.Positional

/** Queries exercising the order-indexed operator family (SURVEY.md §2.6):
  * ZipWithIndex, PrefixSum, Window (sliding + disjoint), Zip, Concat,
  * Merge, ReduceToIndex. Each runs the real graft.operators.Positional
  * implementation and is checked against a window-function DuckDB oracle.
  */
object PositionalQueries {

  private def cents(c: Column): Column = round(c * 100, 0).cast("long")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ZipWithIndex (zip_with_index.hpp:38-179)
    "q_zipwithindex" -> ((s, d) => {
      import s.implicits._
      val sup = Tables.supplier(s, d).select($"s_suppkey").orderBy($"s_suppkey")
      Positional.zipWithIndex(sup, "idx")
    }),

    // PrefixSum (prefix_sum.hpp:28-171): running total in key order
    "q_prefix_sum" -> ((s, d) => {
      import s.implicits._
      val o = Tables.orders(s, d)
        .select($"o_orderkey", cents($"o_totalprice").as("cents"))
        .orderBy($"o_orderkey")
      Positional.prefixSumLong(o, "cents", "run_cents")
        .select($"o_orderkey", $"run_cents")
    }),

    // Window sliding k=3 (window.hpp:32-571)
    "q_window_sliding" -> ((s, d) => {
      import s.implicits._
      val o = Tables.orders(s, d)
        .select($"o_orderkey", cents($"o_totalprice").as("cents"))
        .orderBy($"o_orderkey")
      Positional.slidingSumLong(o, "cents", 3, "w3_cents")
        .select($"o_orderkey", $"w3_cents")
    }),

    // Window disjoint/tumbling k=100 (window.hpp DisjointWindowNode),
    // driven through the shipped facade operator `DIA.windowDisjoint`.
    "q_window_tumbling" -> ((s, d) => {
      import s.implicits._
      val o = Tables.orders(s, d)
        .select($"o_orderkey", cents($"o_totalprice").as("cents"))
        .orderBy($"o_orderkey")
        .select($"cents").as[Long]
      new DIA(o).windowDisjoint(100) { (b, w) => (b, w.size.toLong, w.sum) }
        .ds.toDF("bucket", "n", "sum_cents").orderBy($"bucket")
    }),

    // Zip by equal global index (zip.hpp:77-724, default equal-size mode)
    "q_zip" -> ((s, d) => {
      import s.implicits._
      val byKey = Tables.customer(s, d)
        .select($"c_custkey".as("key_by_key")).orderBy($"key_by_key")
      val byBal = Tables.customer(s, d)
        .select($"c_custkey".as("key_by_bal"), $"c_acctbal")
        .orderBy($"c_acctbal".desc, $"key_by_bal")
        .select($"key_by_bal")
      Positional.zipByIndex(byKey, byBal, "idx")
        .select($"idx", $"key_by_key", $"key_by_bal")
        .orderBy($"idx")
    }),

    // Concat (concat.hpp:35-402): ordered concatenation, explicit positions
    "q_concat" -> ((s, d) => {
      import s.implicits._
      val evens = Tables.orders(s, d).filter($"o_orderkey" % 2 === 0)
        .select($"o_orderkey").orderBy($"o_orderkey")
      val odds = Tables.orders(s, d).filter($"o_orderkey" % 2 === 1)
        .select($"o_orderkey").orderBy($"o_orderkey")
      Positional.concatOrdered(Seq(evens, odds), "pos")
        .select($"o_orderkey", $"pos")
    }),

    // Merge of two sorted inputs (merge.hpp:76-732)
    "q_merge" -> ((s, d) => {
      import s.implicits._
      val base = Tables.orders(s, d)
        .select($"o_orderkey", cents($"o_totalprice").as("price_cents"))
      val a = base.filter($"o_orderkey" % 2 === 0).orderBy($"price_cents", $"o_orderkey")
      val b = base.filter($"o_orderkey" % 2 === 1).orderBy($"price_cents", $"o_orderkey")
      val merged = Positional.mergeSorted(Seq(a, b), Seq("price_cents", "o_orderkey"))
      Positional.zipWithIndex(merged, "pos")
        .select($"pos", $"o_orderkey", $"price_cents")
    }),

    // Merge WITHOUT re-sort (merge.hpp:43-66 multi-sequence selection):
    // run-scatter + run-reorder + streaming two-way merge — no sort step
    // anywhere in the plan; same oracle as q_merge.
    "q_merge_runs" -> ((s, d) => {
      import s.implicits._
      val base = Tables.orders(s, d)
        .select($"o_orderkey", cents($"o_totalprice").as("price_cents"))
      val a = base.filter($"o_orderkey" % 2 === 0).orderBy($"price_cents", $"o_orderkey")
      val b = base.filter($"o_orderkey" % 2 === 1).orderBy($"price_cents", $"o_orderkey")
      val merged = Positional.mergeSortedNoResort(
        Seq(a, b), Seq("price_cents", "o_orderkey"))
      Positional.zipWithIndex(merged, "pos")
        .select($"pos", $"o_orderkey", $"price_cents")
    }),

    // k-ary Merge (merge.hpp:674 — variadic Merge(less, dias...)): three
    // sorted inputs through the typed DIA facade's k-ary overload; same
    // no-re-sort plan as q_merge_runs, folded as a lazy chain of two-way
    // head merges. Oracle = the sorted union, as for q_merge.
    "q_merge3" -> ((s, d) => {
      import s.implicits._
      val base = Tables.orders(s, d)
        .select($"o_orderkey", cents($"o_totalprice").as("price_cents"))
      def side(i: Int) = new DIA(base.filter($"o_orderkey" % 3 === i)
        .orderBy($"price_cents", $"o_orderkey").as[(Long, Long)])
      val merged = side(0).merge(Seq(side(1), side(2)))(t => (t._2, t._1))
      Positional.zipWithIndex(merged.ds.toDF("o_orderkey", "price_cents"), "pos")
        .select($"pos", $"o_orderkey", $"price_cents")
    }),

    // ReduceToIndex (reduce_to_index.hpp:60-391): dense-index aggregation
    // padded with the neutral element, driven through the shipped facade
    // operator `DIA.reduceToIndex`. l_quantity is integer-valued, so the
    // Double sums are exact regardless of reduction order.
    "q_reduce_to_index" -> ((s, d) => {
      import s.implicits._
      val li = Tables.lineitem(s, d)
        .select($"l_linenumber".cast("long"), $"l_quantity").as[(Long, Double)]
      new DIA(li)
        .reduceToIndex(_._1, 8L, (0L, 0.0))((a, b) => (a._1, a._2 + b._2))
        .zipWithIndex((t, i) => (i, t._2))
        .ds.toDF("idx", "sum_qty").orderBy($"idx")
    })
  )

  val oracles: Map[String, String] = Map(
    "q_zipwithindex" ->
      """SELECT s_suppkey,
        | CAST(row_number() OVER (ORDER BY s_suppkey) - 1 AS BIGINT) AS idx
        |FROM supplier ORDER BY s_suppkey""".stripMargin,
    "q_prefix_sum" ->
      """SELECT o_orderkey,
        | CAST(sum(CAST(round(o_totalprice*100,0) AS BIGINT))
        |   OVER (ORDER BY o_orderkey ROWS UNBOUNDED PRECEDING) AS BIGINT) AS run_cents
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q_window_sliding" ->
      """SELECT o_orderkey,
        | CAST(sum(CAST(round(o_totalprice*100,0) AS BIGINT))
        |   OVER (ORDER BY o_orderkey ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT) AS w3_cents
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q_window_tumbling" ->
      """WITH t AS (
        | SELECT CAST(round(o_totalprice*100,0) AS BIGINT) AS cents,
        |  row_number() OVER (ORDER BY o_orderkey) - 1 AS rn
        | FROM orders)
        |SELECT CAST(rn // 100 AS BIGINT) AS bucket, count(*) AS n,
        | CAST(sum(cents) AS BIGINT) AS sum_cents
        |FROM t GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_zip" ->
      """WITH a AS (SELECT c_custkey AS key_by_key,
        |   row_number() OVER (ORDER BY c_custkey) - 1 AS idx FROM customer),
        |b AS (SELECT c_custkey AS key_by_bal,
        |   row_number() OVER (ORDER BY c_acctbal DESC, c_custkey) - 1 AS idx FROM customer)
        |SELECT CAST(a.idx AS BIGINT) AS idx, key_by_key, key_by_bal
        |FROM a JOIN b USING(idx) ORDER BY idx""".stripMargin,
    "q_concat" ->
      """SELECT o_orderkey,
        | CAST(row_number() OVER (ORDER BY o_orderkey % 2, o_orderkey) - 1 AS BIGINT) AS pos
        |FROM orders ORDER BY pos""".stripMargin,
    "q_merge" ->
      """SELECT
        | CAST(row_number() OVER (ORDER BY CAST(round(o_totalprice*100,0) AS BIGINT), o_orderkey) - 1 AS BIGINT) AS pos,
        | o_orderkey, CAST(round(o_totalprice*100,0) AS BIGINT) AS price_cents
        |FROM orders ORDER BY pos""".stripMargin,
    "q_merge_runs" ->
      """SELECT
        | CAST(row_number() OVER (ORDER BY CAST(round(o_totalprice*100,0) AS BIGINT), o_orderkey) - 1 AS BIGINT) AS pos,
        | o_orderkey, CAST(round(o_totalprice*100,0) AS BIGINT) AS price_cents
        |FROM orders ORDER BY pos""".stripMargin,
    "q_merge3" ->
      """SELECT
        | CAST(row_number() OVER (ORDER BY CAST(round(o_totalprice*100,0) AS BIGINT), o_orderkey) - 1 AS BIGINT) AS pos,
        | o_orderkey, CAST(round(o_totalprice*100,0) AS BIGINT) AS price_cents
        |FROM orders ORDER BY pos""".stripMargin,
    "q_reduce_to_index" ->
      """SELECT i AS idx, coalesce(s.sum_qty, 0.0) AS sum_qty
        |FROM range(8) t(i) LEFT JOIN (
        | SELECT CAST(l_linenumber AS BIGINT) AS ln, sum(l_quantity) AS sum_qty
        | FROM lineitem GROUP BY 1) s ON s.ln = t.i
        |ORDER BY idx""".stripMargin
  )
}
