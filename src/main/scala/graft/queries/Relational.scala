package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables

/** Relational core: sources, Map/Filter/FlatMap, ReduceByKey/GroupByKey,
  * InnerJoin (+ the outer/semi/anti superset), Sort, Union, Sample, actions.
  *
  * Reference semantics: thrill/api/dia.hpp:358-482 (Map/Filter/FlatMap),
  * reduce_by_key.hpp:64-239, group_by_key.hpp:47-435, inner_join.hpp:61-827,
  * sort.hpp:64-944, union.hpp:53-366, sum.hpp / min.hpp / max.hpp /
  * size.hpp (actions). Re-expressed declaratively so Catalyst plans the
  * physical execution (partial aggregation, broadcast vs shuffle join,
  * range-partitioned sort) instead of hand-scheduling stages.
  *
  * Oracle-comparability convention: every money aggregate is rounded to an
  * integer unit (cents / 1e-4) PER ROW before summation, so the result is
  * exact in Long arithmetic and independent of FP summation order — the
  * same rows produce bit-identical results in Spark and DuckDB.
  */
object Relational {

  /** Row-level exact cents: round(x*100) as long — FP-order-independent. */
  private def cents(c: Column): Column = round(c * 100, 0).cast("long")
  /** Row-level exact 1e-4 units, for products of two 2-decimal values. */
  private def e4(c: Column): Column = round(c * 10000, 0).cast("long")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- sources ---------------------------------------------------------
    // Generate (thrill/api/generate.hpp:36-139): spark.range is the
    // distributed index source; arithmetic stays in whole-stage codegen.
    "q_generate" -> ((s, _) => {
      import s.implicits._
      s.range(1000000L)
        .select((($"id" * 2654435761L) % 1000000007L).as("h"))
        .agg(count(lit(1)).as("n"), sum($"h").as("h_sum"))
    }),

    // --- LOps: Map/Filter fused into the scan (predicate pushdown) -------
    "q_filter_project" -> ((s, d) => {
      import s.implicits._
      Tables.lineitem(s, d)
        .filter($"l_quantity" >= 49 && $"l_shipdate" >= "1997-01-01")
        .select($"l_orderkey", $"l_linenumber".cast("long").as("l_linenumber"),
          cents($"l_extendedprice").as("price_cents"))
        .orderBy($"l_orderkey", $"l_linenumber")
    }),

    // --- ReduceByKey → partial+final HashAggregate (TPC-H Q1 shape) ------
    "q1_agg" -> ((s, d) => {
      import s.implicits._
      Tables.lineitem(s, d)
        .filter($"l_shipdate" < "1998-09-02")
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          sum($"l_quantity").as("sum_qty"),
          sum(cents($"l_extendedprice")).as("sum_base_cents"),
          sum(e4($"l_extendedprice" * (lit(1.0) - $"l_discount"))).as("sum_disc_e4"),
          sum(e4($"l_extendedprice" * (lit(1.0) - $"l_discount") * (lit(1.0) + $"l_tax"))).as("sum_charge_e4"),
          count(lit(1)).as("count_order"))
        .orderBy($"l_returnflag", $"l_linestatus")
    }),

    // --- GroupByKey with non-associative UDF (median), typed mapGroups ---
    // thrill GroupByKey streams an iterator of the whole group to the UDF
    // (group_by_key.hpp:47-435); Spark's mapGroups has identical semantics.
    "q_groupby_median" -> ((s, d) => {
      import s.implicits._
      Tables.lineitem(s, d)
        .select($"l_returnflag", $"l_extendedprice").as[(String, Double)]
        .groupByKey(_._1)
        .mapGroups { (flag, it) =>
          val v = it.map(_._2).toArray
          java.util.Arrays.sort(v)
          val n = v.length
          val med = if (n % 2 == 1) v(n / 2) else (v(n / 2 - 1) + v(n / 2)) / 2.0
          (flag, med)
        }
        .toDF("l_returnflag", "median_price")
        .orderBy($"l_returnflag")
    }),

    // --- InnerJoin (inner_join.hpp:61-827) + agg + top-k ------------------
    "q3_top_orders" -> ((s, d) => {
      import s.implicits._
      val c = Tables.customer(s, d).filter($"c_acctbal" > 1000)
      val o = Tables.orders(s, d).filter($"o_orderdate" >= "1996-01-01")
      val l = Tables.lineitem(s, d)
      c.join(o, $"c_custkey" === $"o_custkey")
        .join(l, $"o_orderkey" === $"l_orderkey")
        .groupBy($"o_orderkey", date_format($"o_orderdate", "yyyy-MM-dd").as("o_day"))
        .agg(sum(e4($"l_extendedprice" * (lit(1.0) - $"l_discount"))).as("revenue_e4"))
        .orderBy($"revenue_e4".desc, $"o_orderkey")
        .limit(10)
    }),

    // --- semi join (superset of the reference's InnerJoin-only surface) --
    "q4_priority" -> ((s, d) => {
      import s.implicits._
      val hot = Tables.lineitem(s, d).filter($"l_quantity" >= 49).select($"l_orderkey")
      Tables.orders(s, d)
        .join(hot, $"o_orderkey" === $"l_orderkey", "left_semi")
        .groupBy($"o_orderpriority")
        .agg(count(lit(1)).as("n"))
        .orderBy($"o_orderpriority")
    }),

    // --- multi-way join with broadcast dims ------------------------------
    "q5_region_revenue" -> ((s, d) => {
      import s.implicits._
      val r = broadcast(Tables.region(s, d))
      val n = broadcast(Tables.nation(s, d))
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d)
      r.join(n, $"r_regionkey" === $"n_regionkey")
        .join(c, $"n_nationkey" === $"c_nationkey")
        .join(o, $"c_custkey" === $"o_custkey")
        .groupBy($"r_name")
        .agg(sum(cents($"o_totalprice")).as("revenue_cents"),
          count(lit(1)).as("n_orders"))
        .orderBy($"r_name")
    }),

    // --- anti join --------------------------------------------------------
    "q_customers_no_orders" -> ((s, d) => {
      import s.implicits._
      Tables.customer(s, d)
        .join(Tables.orders(s, d).filter($"o_totalprice" > 400000),
          $"c_custkey" === $"o_custkey", "left_anti")
        .groupBy($"c_mktsegment")
        .agg(count(lit(1)).as("n"))
        .orderBy($"c_mktsegment")
    }),

    // --- left outer join + histogram -------------------------------------
    "q_order_line_hist" -> ((s, d) => {
      import s.implicits._
      Tables.orders(s, d)
        .join(Tables.lineitem(s, d).select($"l_orderkey"),
          $"o_orderkey" === $"l_orderkey", "left")
        .groupBy($"o_orderkey")
        .agg(count($"l_orderkey").as("n_lines"))
        .groupBy($"n_lines")
        .agg(count(lit(1)).as("n_orders"))
        .orderBy($"n_lines")
    }),

    // --- correlated-subquery shape (TPC-H Q2-like): per part, the
    //     supplier(s) achieving the MINIMUM sale price among EUROPE
    //     suppliers. The correlated `price = (SELECT min(price) WHERE
    //     same part)` decorrelates Spark-side into a per-part min
    //     aggregate joined back on (part, price) — no window sort; the
    //     min table is O(#filtered parts) and broadcast, the part filter
    //     and the EUROPE supplier set prune the lineitem scan via
    //     broadcast joins before the aggregate. Ties (several suppliers
    //     at the min) are all returned, same as Q2. ------------------------
    "q_min_cost_supplier" -> ((s, d) => {
      import s.implicits._
      val euSup = Tables.supplier(s, d)
        .join(broadcast(Tables.nation(s, d)), $"s_nationkey" === $"n_nationkey")
        .join(broadcast(Tables.region(s, d).filter($"r_name" === "EUROPE")),
          $"n_regionkey" === $"r_regionkey")
        .select($"s_suppkey", $"s_name", $"n_name")
      val parts = Tables.part(s, d).filter($"p_size" === 15)
        .select($"p_partkey", $"p_name")
      val offers = Tables.lineitem(s, d)
        .select($"l_partkey", $"l_suppkey", cents($"l_extendedprice").as("price_cents"))
        .join(broadcast(euSup.select($"s_suppkey")), $"l_suppkey" === $"s_suppkey")
        .join(broadcast(parts), $"l_partkey" === $"p_partkey")
        .select($"l_partkey", $"l_suppkey", $"price_cents", $"p_partkey", $"p_name")
        .distinct()
      val mins = offers.groupBy($"l_partkey".as("mk"))
        .agg(min($"price_cents").as("min_price_cents"))
      offers
        .join(broadcast(mins),
          $"l_partkey" === $"mk" && $"price_cents" === $"min_price_cents")
        .join(broadcast(euSup), $"l_suppkey" === $"s_suppkey")
        .select($"p_partkey", $"p_name", $"min_price_cents",
          $"s_suppkey", $"s_name", $"n_name")
        .orderBy($"p_partkey", $"s_suppkey")
    }),

    // --- 6-table join (TPC-H Q7-like): cross-nation trade volume by ship
    //     year — lineitem ⋈ supplier ⋈ nation(supp) ⋈ orders ⋈ customer ⋈
    //     nation(cust), supp_nation <> cust_nation. The nation-joined
    //     supplier and customer dims broadcast, so the only corpus-sized
    //     shuffle is the lineitem⋈orders orderkey join; the disequality is
    //     a post-join residual, never a join condition (no nested-loop).
    //     (No nation IN-list: the driver's smallest SF has too few
    //     suppliers to guarantee any given pair is populated.) -------------
    "q_nation_volume" -> ((s, d) => {
      import s.implicits._
      val supNat = broadcast(Tables.supplier(s, d)
        .join(Tables.nation(s, d), $"s_nationkey" === $"n_nationkey")
        .select($"s_suppkey", $"n_name".as("supp_nation")))
      val custNat = Tables.customer(s, d)
        .join(broadcast(Tables.nation(s, d)
          .select($"n_nationkey".as("cnk"), $"n_name".as("cust_nation"))),
          $"c_nationkey" === $"cnk")
        .select($"c_custkey", $"cust_nation")
      Tables.lineitem(s, d)
        .select($"l_orderkey", $"l_suppkey",
          year($"l_shipdate").cast("long").as("l_year"),
          e4($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("vol_e4"))
        .join(supNat, $"l_suppkey" === $"s_suppkey")
        .join(Tables.orders(s, d).select($"o_orderkey", $"o_custkey"),
          $"l_orderkey" === $"o_orderkey")
        .join(custNat, $"o_custkey" === $"c_custkey")
        .filter($"supp_nation" =!= $"cust_nation")
        .groupBy($"supp_nation", $"cust_nation", $"l_year")
        .agg(sum($"vol_e4").as("revenue_e4"), count(lit(1)).as("n_lines"))
        .orderBy($"supp_nation", $"cust_nation", $"l_year")
    }),

    // --- EXISTS + NOT EXISTS correlated shape (TPC-H Q21-like): per
    //     supplier, count the finished-order lines where the supplier has
    //     a high-quantity line, the order involves OTHER suppliers
    //     (EXISTS), and NO other supplier's line is high-quantity
    //     (NOT EXISTS). Both correlated subqueries decorrelate into one
    //     per-order aggregate — countDistinct suppliers (EXISTS ⇔ ≥ 2)
    //     and countDistinct high-quantity suppliers (NOT EXISTS ⇔ = 1) —
    //     computed in a single pass and broadcast back onto the
    //     high-quantity lines, so the corpus shuffles once on orderkey
    //     for the stats and once for the join. ----------------------------
    "q_sole_hi_supplier" -> ((s, d) => {
      import s.implicits._
      val li = Tables.lineitem(s, d)
        .select($"l_orderkey", $"l_suppkey", $"l_quantity")
      // two plain hash aggregates instead of
      // countDistinct(supp), countDistinct(when(hi, supp)): the
      // multi-distinct form plans an Expand (3 rows per input row)
      // before the shuffle; pre-aggregating per (order, supplier) —
      // map-side partials collapse each order's lines for a supplier —
      // then counting per order shuffles at most one row per distinct
      // (order, supplier) and measured 19.4 -> 12.6 s at sf10 (SCALE.md
      // round 9).
      val perSupp = li.groupBy($"l_orderkey".as("ok"), $"l_suppkey")
        .agg(max(when($"l_quantity" >= 48, 1).otherwise(0)).as("hi"))
      val ordStats = perSupp.groupBy($"ok")
        .agg(count(lit(1)).as("n_supp"), sum($"hi").as("n_hi_supp"))
        .filter($"n_supp" >= 2 && $"n_hi_supp" === 1)
        .select($"ok")
      val fOrders = Tables.orders(s, d)
        .filter($"o_orderstatus" === "F").select($"o_orderkey")
      li.filter($"l_quantity" >= 48)
        .join(ordStats, $"l_orderkey" === $"ok")
        .join(fOrders, $"l_orderkey" === $"o_orderkey")
        .join(broadcast(Tables.supplier(s, d)), $"l_suppkey" === $"s_suppkey")
        .groupBy($"s_name")
        .agg(count(lit(1)).as("numwait"))
        .orderBy($"numwait".desc, $"s_name")
        .limit(20)
    }),

    // --- Sort (sort.hpp:64-944 ≡ sample-based RangePartitioner sort) -----
    "q_sort_top100" -> ((s, d) => {
      import s.implicits._
      Tables.lineitem(s, d)
        .select($"l_orderkey", $"l_linenumber".cast("long").as("l_linenumber"),
          cents($"l_extendedprice").as("price_cents"))
        .orderBy($"price_cents".desc, $"l_orderkey", $"l_linenumber")
        .limit(100)
    }),

    // --- top-k (TakeOrdered physical op, no full sort materialized) ------
    "q_topk_orders" -> ((s, d) => {
      import s.implicits._
      Tables.orders(s, d)
        .select($"o_orderkey", cents($"o_totalprice").as("price_cents"))
        .orderBy($"price_cents".desc, $"o_orderkey")
        .limit(10)
    }),

    // --- grouped top-k (bounded-buffer typed Aggregator: only k rows per
    //     key per map partition cross the shuffle — no per-group sort) ----
    "q_topk_per_key" -> ((s, d) => {
      import s.implicits._
      graft.operators.TopK.topKPerKey(Tables.customer(s, d),
          Seq("c_nationkey"), "c_acctbal", "c_custkey", k = 3)
        .orderBy($"c_nationkey", $"rank")
    }),

    // --- distinct ---------------------------------------------------------
    "q_distinct" -> ((s, d) => {
      import s.implicits._
      Tables.lineitem(s, d)
        .select($"l_returnflag", $"l_linestatus").distinct()
        .orderBy($"l_returnflag", $"l_linestatus")
    }),

    // --- Union (bag union, union.hpp:53-366) ------------------------------
    "q_union" -> ((s, d) => {
      import s.implicits._
      val a = Tables.lineitem(s, d).filter($"l_quantity" >= 49).select($"l_orderkey")
      val b = Tables.lineitem(s, d).filter($"l_extendedprice" < 1500).select($"l_orderkey")
      a.union(b).agg(count(lit(1)).as("n"), sum($"l_orderkey").as("key_sum"))
    }),

    // --- ReadLines→FlatMap→ReduceByKey (WordCount,
    //     examples/word_count/word_count.hpp:35-57) -------------------------
    "q_wordcount" -> ((s, d) => {
      import s.implicits._
      Tables.documents(s, d)
        .select(explode(split($"text", " ")).as("word"))
        .filter($"word" =!= "")
        .groupBy($"word")
        .agg(count(lit(1)).as("cnt"))
        .orderBy($"cnt".desc, $"word")
        .limit(100)
    }),

    // --- deterministic modulo "sample" (oracle-able stand-in for
    //     BernoulliSample; statistical sampling is exercised in tests) -----
    "q_sample_mod" -> ((s, d) => {
      import s.implicits._
      Tables.lineitem(s, d)
        .filter($"l_orderkey" % 97 === 0)
        .agg(count(lit(1)).as("n"), sum($"l_orderkey").as("key_sum"))
    }),

    // --- actions Size/Sum/Min/Max via typed reduce (sum.hpp, min.hpp) ----
    "q_stats_actions" -> ((s, d) => {
      import s.implicits._
      val ds = Tables.lineitem(s, d)
        .select($"l_quantity", $"l_extendedprice").as[(Double, Double)]
      val n = ds.count() // Size (thrill/api/size.hpp:28-110)
      val sumQty = ds.map(_._1).reduce(_ + _) // Sum — exact: integer-valued
      val minP = ds.map(_._2).reduce(math.min) // Min via AllReduce
      val maxP = ds.map(_._2).reduce(math.max) // Max via AllReduce
      Seq((n, sumQty, minP, maxP))
        .toDF("n_rows", "sum_qty", "min_price", "max_price")
    }),

    // --- HyperLogLog (hyperloglog.hpp:26-79) → Spark HLL++. The sketch
    //     value itself is engine-specific, so the oracle gates the HLL
    //     guarantee instead: |approx − exact| ≤ 2·rsd·exact (rsd = 0.05,
    //     Spark's default) must hold for each column, alongside the exact
    //     counts DuckDB can verify directly. -------------------------------
    "q_hll" -> ((s, d) => {
      import s.implicits._
      val rsd = 0.05 // approx_count_distinct default relativeSD
      // one row per column, each a single-column scan (a combined 3-column
      // countDistinct agg forces a 6-way Expand — 3x the runtime)
      def one(c: String) = Tables.lineitem(s, d)
        .agg(approx_count_distinct(col(c)).as("a"),
          countDistinct(col(c)).as("exact_n"))
        .select(lit(c).as("col_name"), $"exact_n",
          (abs($"a".cast("double") - $"exact_n".cast("double")) <=
            lit(2 * rsd) * $"exact_n".cast("double")).as("ok"))
      Seq("l_orderkey", "l_partkey", "l_suppkey").map(one)
        .reduce(_ unionAll _).orderBy($"col_name")
    }),

    // --- Mergeable HLL sketch COLUMNS (Spark's built-in Apache
    //     DataSketches functions): the 100 TB pre-aggregate pattern that
    //     approx_count_distinct (q_hll) cannot express — per-group
    //     sketches are materialized as values, storable/re-unionable
    //     later WITHOUT rescanning the corpus (daily-partition sketches →
    //     monthly rollup). Per-source sketches of document fingerprints;
    //     the __all__ row's estimate comes ONLY from hll_union_agg of the
    //     per-source sketches. Same convention as q_hll: Spark asserts
    //     |estimate − exact| ≤ 3·rse·exact in-plan (rse = 1.04/√2¹²,
    //     the lgConfigK=12 default), the oracle pins the booleans TRUE
    //     and verifies the exact cardinalities. -------------------------
    "q_hll_sketch" -> ((s, d) => {
      import s.implicits._
      val docs = Tables.documents(s, d).select($"source", md5($"text").as("fp"))
      val bound = 3.0 * 1.04 / math.sqrt((1 << 12).toDouble)
      val per = docs.groupBy($"source")
        .agg(hll_sketch_agg($"fp").as("sk"), countDistinct($"fp").as("exact_n"))
      def okCol(sketch: org.apache.spark.sql.Column,
          exact: org.apache.spark.sql.Column) =
        abs(hll_sketch_estimate(sketch).cast("double") - exact.cast("double")) <=
          lit(bound) * exact.cast("double")
      val perRows = per.select($"source", $"exact_n",
        okCol($"sk", $"exact_n").as("ok"))
      // fingerprints can repeat across sources (planted duplicate docs), so
      // the global exact is its own aggregate, not a sum of the per-source
      val globalRow = per.agg(hll_union_agg($"sk").as("gsk"))
        .crossJoin(docs.agg(countDistinct($"fp").as("exact_n")))
        .select(lit("__all__").as("source"), $"exact_n",
          okCol($"gsk", $"exact_n").as("ok"))
      perRows.unionAll(globalRow).orderBy($"source")
    }),

    // --- Approximate quantiles: percentile_approx is Spark's mergeable
    //     Greenwald-Khanna-style sketch — ONE pass, O(accuracy) state per
    //     partition, partial-merged across executors (the 100 TB shape;
    //     exact percentile needs a full sort). The sketch guarantee is
    //     rank error ≤ N/accuracy: the gate recomputes the returned
    //     value's true rank interval [#<apx, #≤apx] in-plan and asserts it
    //     intersects (q ± 2/accuracy)·N (tie-safe, 2x headroom); the
    //     oracle pins those booleans TRUE and independently verifies the
    //     EXACT interpolated quantiles (Spark percentile ≡ DuckDB
    //     quantile_cont). ------------------------------------------------
    "q_approx_quantiles" -> ((s, d) => {
      import s.implicits._
      val li = Tables.lineitem(s, d).select($"l_extendedprice".as("x"))
      val acc = 1000
      val qs = Seq(0.25, 0.5, 0.75, 0.95)
      // TWO scans total for all quantiles: both percentile aggregates take
      // the percentage ARRAY (one sketch / one sort shared across qs), and
      // the rank recheck folds all 8 counters into one pass.
      val a = li.agg(
        percentile_approx($"x", array(qs.map(lit): _*), lit(acc)).as("apx"),
        percentile($"x", array(qs.map(lit): _*)).as("exact_v"),
        count(lit(1)).as("n"))
      val counters = qs.indices.flatMap(i => Seq(
        sum(when($"x" < $"apx"(i), 1L).otherwise(0L)).as(s"nlt_$i"),
        sum(when($"x" <= $"apx"(i), 1L).otherwise(0L)).as(s"nle_$i")))
      val firsts = Seq(first($"exact_v").as("exact_v"), first($"n").as("n"))
      val row = li.crossJoin(broadcast(a))
        .agg((counters ++ firsts).head, (counters ++ firsts).tail: _*)
      row.select(explode(array(qs.zipWithIndex.map { case (q, i) =>
          struct(lit(q).as("pct"), round($"exact_v"(i), 4).as("exact_value"),
            (col(s"nlt_$i") <= ceil((lit(q) + lit(2.0 / acc)) * $"n") &&
              col(s"nle_$i") >= floor((lit(q) - lit(2.0 / acc)) * $"n"))
              .as("ok"))
        }: _*)).as("r"))
        .select($"r.pct", $"r.exact_value", $"r.ok")
        .orderBy($"pct")
    }),

    // --- events: JSON scalar extraction + agg ----------------------------
    "q_events_json" -> ((s, d) => {
      import s.implicits._
      Tables.events(s, d)
        .groupBy($"event_type")
        .agg(sum(get_json_object($"props", "$.k").cast("long")).as("k_sum"),
          count(lit(1)).as("n"))
        .orderBy($"event_type")
    }),

    // --- events: daily rollup (batch form of the streaming windowed agg) -
    "q_events_daily" -> ((s, d) => {
      import s.implicits._
      Tables.events(s, d)
        .groupBy($"event_type", date_format($"ts", "yyyy-MM-dd").as("day"))
        .agg(count(lit(1)).as("n"), sum(cents($"value")).as("value_cents"))
        .orderBy($"event_type", $"day")
    }),

    // --- events: cohort retention triangle (first-touch epoch-day cohort
    //     × day offset, distinct users + volume; integer day arithmetic
    //     re-derived verbatim in the oracle) ------------------------------
    "q_cohort_retention" -> ((s, d) => {
      import s.implicits._
      graft.streaming.EventStream.cohortRetention(Tables.events(s, d))
        .orderBy($"cohort_day", $"offset_days")
    }),

    // --- events: click→purchase attribution (event-time interval
    //     self-join; batch twin of EventStream.attributionStream) --------
    "q_attribution" -> ((s, d) => {
      import s.implicits._
      graft.streaming.EventStream.attribution(Tables.events(s, d), "4 hours")
        .orderBy($"purchase_id", $"click_id")
    }),

    // --- events: AS-OF join — each purchase picks the user's most recent
    //     click at-or-before it (left-outer). Compiles to one shuffle +
    //     running window, no Join operator (TemporalJoins.asofJoinBackward);
    //     oracle is DuckDB's native ASOF LEFT JOIN. Right side is unique
    //     per (user, ts) by construction (event timestamps are strictly
    //     increasing), satisfying the as-of determinism contract. ---------
    "q_asof_join" -> ((s, d) => {
      import s.implicits._
      val ev = Tables.events(s, d)
      val purchases = ev.filter($"event_type" === "purchase")
        .select($"user_id", $"ts".as("p_ts"), $"event_id".as("purchase_id"))
      val clicks = ev.filter($"event_type" === "click")
        .select($"user_id", $"ts".as("c_ts"), $"event_id".as("click_id"))
      graft.operators.TemporalJoins
        .asofJoinBackward(purchases, clicks, Seq("user_id"), "p_ts", "c_ts")
        .select($"purchase_id", $"user_id", $"click_id",
          (unix_micros($"p_ts") - unix_micros($"c_ts")).as("gap_us"))
        .orderBy($"purchase_id")
    }),

    // --- events: RANGE join — clicks falling inside the 4-hour window
    //     after any error by the same user. Bucketized equi-join
    //     (TemporalJoins.rangeJoin): never a nested-loop plan; the oracle
    //     is the plain inequality join DuckDB can afford at gate scale. ---
    "q_range_join" -> ((s, d) => {
      import s.implicits._
      val ev = Tables.events(s, d)
      val clicks = ev.filter($"event_type" === "click")
        .select($"user_id", unix_micros($"ts").as("p"),
          $"event_id".as("click_id"))
      val windows = ev.filter($"event_type" === "error")
        .select($"user_id", unix_micros($"ts").as("lo"),
          (unix_micros($"ts") + 14400L * 1000000L).as("hi"),
          $"event_id".as("error_id"))
      graft.operators.TemporalJoins
        .rangeJoin(clicks, windows, "p", "lo", "hi",
          bucketWidth = 14400L * 1000000L, keys = Seq("user_id"))
        .select($"error_id", $"click_id", $"user_id",
          ($"p" - $"lo").as("lag_us"))
        .orderBy($"error_id", $"click_id")
    }),

    // --- events: time-RANGE rolling window — per-user trailing-1-hour
    //     event count + spend, keyed on event TIME, not row position
    //     (RANGE BETWEEN, the time-based sibling of the positional
    //     DIA.window family; Spark's WindowExec bounds the frame by the
    //     order value so sparse and bursty users cost the same). One
    //     shuffle on user_id; the frame scan is monotone two-pointer, not
    //     O(rows·frame). Timestamps are strictly increasing per the
    //     generator, so the frame is tie-free and deterministic. ----------
    "q_rolling_window" -> ((s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"us")
        .rangeBetween(-3600L * 1000000L, 0L)
      Tables.events(s, d)
        .select($"event_id", $"user_id", unix_micros($"ts").as("us"),
          cents($"value").as("vc"))
        .select($"event_id", $"user_id",
          count(lit(1)).over(w).as("n_1h"),
          sum($"vc").over(w).as("cents_1h"))
        .orderBy($"event_id")
    }),

    // --- pivot: per-user event-type cross-tab. Pivot values passed
    //     EXPLICITLY — omitting them makes Spark run a driver-side
    //     distinct over the pivot column first (a full extra job, and a
    //     cardinality hazard at 100 TB). Compiles to one hash aggregate
    //     with pivot-CASE expressions; absent cells coalesce to 0. ------
    "q_pivot" -> ((s, d) => {
      import s.implicits._
      Tables.events(s, d)
        .groupBy($"user_id")
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(count(lit(1)))
        .select($"user_id" +: Seq("click", "error", "purchase", "signup", "view")
          .map(c => coalesce(col(c), lit(0L)).as(c)): _*)
        .orderBy($"user_id")
    }),

    // --- rollup: SQL-superset grouping sets (the reference has no SQL
    //     layer at all — declared superset capability) -------------------
    "q_rollup" -> ((s, d) => {
      import s.implicits._
      Tables.lineitem(s, d)
        .rollup($"l_returnflag", $"l_linestatus")
        .agg(count(lit(1)).as("n"), sum($"l_quantity").as("sum_qty"))
        .orderBy($"l_returnflag".asc_nulls_first, $"l_linestatus".asc_nulls_first)
    }),

    // --- events: sessionization (30-min gap), batch window functions -----
    "q_sessionize" -> ((s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      val gapUs = 30L * 60 * 1000000
      val sess = Tables.events(s, d)
        .withColumn("prev", lag($"ts", 1).over(w))
        .withColumn("new_s",
          when($"prev".isNull ||
            unix_micros($"ts") - unix_micros($"prev") > gapUs, 1).otherwise(0))
        .withColumn("sid", sum($"new_s")
          .over(w.rowsBetween(Window.unboundedPreceding, 0)))
      sess.groupBy($"user_id").agg(max($"sid").as("n_sessions"))
        .groupBy($"n_sessions").agg(count(lit(1)).as("n_users"))
        .orderBy($"n_sessions")
    })
  )

  val oracles: Map[String, String] = Map(
    "q_generate" ->
      """SELECT count(*) AS n,
        | CAST(sum((range*2654435761) % 1000000007) AS BIGINT) AS h_sum
        |FROM range(1000000)""".stripMargin,
    "q_filter_project" ->
      """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
        | CAST(round(l_extendedprice*100,0) AS BIGINT) AS price_cents
        |FROM lineitem
        |WHERE l_quantity >= 49 AND l_shipdate >= TIMESTAMP '1997-01-01'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        | sum(l_quantity) AS sum_qty,
        | CAST(sum(CAST(round(l_extendedprice*100,0) AS BIGINT)) AS BIGINT) AS sum_base_cents,
        | CAST(sum(CAST(round(l_extendedprice*(1-l_discount)*10000,0) AS BIGINT)) AS BIGINT) AS sum_disc_e4,
        | CAST(sum(CAST(round(l_extendedprice*(1-l_discount)*(1+l_tax)*10000,0) AS BIGINT)) AS BIGINT) AS sum_charge_e4,
        | count(*) AS count_order
        |FROM lineitem WHERE l_shipdate < TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q_groupby_median" ->
      """SELECT l_returnflag, median(l_extendedprice) AS median_price
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "q3_top_orders" ->
      """SELECT o_orderkey, strftime(o_orderdate,'%Y-%m-%d') AS o_day,
        | CAST(sum(CAST(round(l_extendedprice*(1-l_discount)*10000,0) AS BIGINT)) AS BIGINT) AS revenue_e4
        |FROM customer JOIN orders ON c_custkey=o_custkey
        | JOIN lineitem ON o_orderkey=l_orderkey
        |WHERE c_acctbal > 1000 AND o_orderdate >= TIMESTAMP '1996-01-01'
        |GROUP BY 1,2 ORDER BY revenue_e4 DESC, o_orderkey LIMIT 10""".stripMargin,
    "q4_priority" ->
      """SELECT o_orderpriority, count(*) AS n FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |  WHERE l_orderkey = o_orderkey AND l_quantity >= 49)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q5_region_revenue" ->
      """SELECT r_name,
        | CAST(sum(CAST(round(o_totalprice*100,0) AS BIGINT)) AS BIGINT) AS revenue_cents,
        | count(*) AS n_orders
        |FROM region JOIN nation ON r_regionkey=n_regionkey
        | JOIN customer ON n_nationkey=c_nationkey
        | JOIN orders ON c_custkey=o_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_customers_no_orders" ->
      """SELECT c_mktsegment, count(*) AS n FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_totalprice > 400000)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_order_line_hist" ->
      """SELECT n_lines, count(*) AS n_orders FROM (
        | SELECT o_orderkey, count(l_orderkey) AS n_lines
        | FROM orders LEFT JOIN lineitem ON o_orderkey=l_orderkey GROUP BY 1)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // genuine correlated subquery in the oracle; the Spark side
    // decorrelates it into min-agg + join-back (same rows, incl. ties)
    "q_min_cost_supplier" ->
      """WITH eu_sup AS (
        | SELECT s_suppkey, s_name, n_name FROM supplier
        | JOIN nation ON n_nationkey = s_nationkey
        | JOIN region ON r_regionkey = n_regionkey
        | WHERE r_name = 'EUROPE'),
        |offers AS (
        | SELECT DISTINCT l_partkey, l_suppkey, p_partkey, p_name,
        |  CAST(round(l_extendedprice*100,0) AS BIGINT) AS price_cents
        | FROM lineitem
        | JOIN eu_sup ON s_suppkey = l_suppkey
        | JOIN part ON p_partkey = l_partkey
        | WHERE p_size = 15)
        |SELECT o.p_partkey, o.p_name, o.price_cents AS min_price_cents,
        | s.s_suppkey, s.s_name, s.n_name
        |FROM offers o JOIN eu_sup s ON s.s_suppkey = o.l_suppkey
        |WHERE o.price_cents = (
        | SELECT min(o2.price_cents) FROM offers o2
        | WHERE o2.l_partkey = o.l_partkey)
        |ORDER BY o.p_partkey, s.s_suppkey""".stripMargin,
    "q_nation_volume" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        | CAST(year(l_shipdate) AS BIGINT) AS l_year,
        | CAST(sum(CAST(round(l_extendedprice*(1-l_discount)*10000,0) AS BIGINT)) AS BIGINT) AS revenue_e4,
        | count(*) AS n_lines
        |FROM lineitem
        | JOIN supplier ON s_suppkey = l_suppkey
        | JOIN nation n1 ON n1.n_nationkey = s_nationkey
        | JOIN orders ON o_orderkey = l_orderkey
        | JOIN customer ON c_custkey = o_custkey
        | JOIN nation n2 ON n2.n_nationkey = c_nationkey
        |WHERE n1.n_name <> n2.n_name
        |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    // the oracle keeps BOTH genuine correlated subqueries (EXISTS and
    // NOT EXISTS); the Spark side decorrelates them into one per-order
    // distinct-count aggregate
    "q_sole_hi_supplier" ->
      """SELECT s_name, count(*) AS numwait
        |FROM supplier, lineitem l1, orders
        |WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
        | AND l1.l_quantity >= 48 AND o_orderstatus = 'F'
        | AND EXISTS (SELECT 1 FROM lineitem l2
        |   WHERE l2.l_orderkey = l1.l_orderkey
        |     AND l2.l_suppkey <> l1.l_suppkey)
        | AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |   WHERE l3.l_orderkey = l1.l_orderkey
        |     AND l3.l_suppkey <> l1.l_suppkey AND l3.l_quantity >= 48)
        |GROUP BY 1 ORDER BY numwait DESC, s_name LIMIT 20""".stripMargin,
    "q_sort_top100" ->
      """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
        | CAST(round(l_extendedprice*100,0) AS BIGINT) AS price_cents
        |FROM lineitem
        |ORDER BY price_cents DESC, l_orderkey, l_linenumber LIMIT 100""".stripMargin,
    "q_topk_orders" ->
      """SELECT o_orderkey, CAST(round(o_totalprice*100,0) AS BIGINT) AS price_cents
        |FROM orders ORDER BY price_cents DESC, o_orderkey LIMIT 10""".stripMargin,
    "q_topk_per_key" ->
      """SELECT c_nationkey, CAST(rn AS INTEGER) AS rank, c_custkey, c_acctbal
        |FROM (
        | SELECT c_nationkey, c_custkey, c_acctbal, row_number() OVER (
        |   PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS rn
        | FROM customer)
        |WHERE rn <= 3 ORDER BY c_nationkey, rank""".stripMargin,
    "q_distinct" ->
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
        |ORDER BY 1, 2""".stripMargin,
    "q_union" ->
      """SELECT count(*) AS n, CAST(sum(l_orderkey) AS BIGINT) AS key_sum FROM (
        | SELECT l_orderkey FROM lineitem WHERE l_quantity >= 49
        | UNION ALL
        | SELECT l_orderkey FROM lineitem WHERE l_extendedprice < 1500)""".stripMargin,
    "q_wordcount" ->
      """SELECT word, count(*) AS cnt FROM (
        | SELECT unnest(string_split(text,' ')) AS word FROM documents)
        |WHERE word <> '' GROUP BY 1 ORDER BY cnt DESC, word LIMIT 100""".stripMargin,
    "q_sample_mod" ->
      """SELECT count(*) AS n, CAST(sum(l_orderkey) AS BIGINT) AS key_sum
        |FROM lineitem WHERE l_orderkey % 97 = 0""".stripMargin,
    "q_stats_actions" ->
      """SELECT count(*) AS n_rows, sum(l_quantity) AS sum_qty,
        | min(l_extendedprice) AS min_price, max(l_extendedprice) AS max_price
        |FROM lineitem""".stripMargin,
    "q_events_json" ->
      """SELECT event_type,
        | CAST(sum(CAST(json_extract_string(props,'$.k') AS BIGINT)) AS BIGINT) AS k_sum,
        | count(*) AS n
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_events_daily" ->
      """SELECT event_type, strftime(ts,'%Y-%m-%d') AS day, count(*) AS n,
        | CAST(sum(CAST(round(value*100,0) AS BIGINT)) AS BIGINT) AS value_cents
        |FROM events GROUP BY 1,2 ORDER BY event_type, day""".stripMargin,
    "q_cohort_retention" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) // 86400000000 AS d
        |  FROM events),
        |ft AS (SELECT user_id, min(d) AS cohort_day FROM e GROUP BY 1)
        |SELECT ft.cohort_day, e.d - ft.cohort_day AS offset_days,
        | count(DISTINCT e.user_id) AS n_users, count(*) AS n_events
        |FROM e JOIN ft USING (user_id)
        |GROUP BY 1, 2 ORDER BY cohort_day, offset_days""".stripMargin,
    // DuckDB's native ASOF LEFT JOIN is the independent re-expression of
    // asofJoinBackward; epoch_us normalizes both engines to micros
    "q_asof_join" ->
      """WITH p AS (SELECT user_id, ts AS p_ts, event_id AS purchase_id
        |  FROM events WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, ts AS c_ts, event_id AS click_id
        |  FROM events WHERE event_type = 'click')
        |SELECT p.purchase_id, p.user_id, c.click_id,
        | epoch_us(p.p_ts) - epoch_us(c.c_ts) AS gap_us
        |FROM p ASOF LEFT JOIN c
        |  ON p.user_id = c.user_id AND c.c_ts <= p.p_ts
        |ORDER BY purchase_id""".stripMargin,
    "q_range_join" ->
      """WITH c AS (SELECT user_id, epoch_us(ts) AS p, event_id AS click_id
        |  FROM events WHERE event_type = 'click'),
        |e AS (SELECT user_id, epoch_us(ts) AS lo,
        |    epoch_us(ts) + 14400000000 AS hi, event_id AS error_id
        |  FROM events WHERE event_type = 'error')
        |SELECT e.error_id, c.click_id, c.user_id, c.p - e.lo AS lag_us
        |FROM e JOIN c ON c.user_id = e.user_id
        |  AND c.p >= e.lo AND c.p <= e.hi
        |ORDER BY error_id, click_id""".stripMargin,
    // epoch_us normalizes to the microsecond precision Spark compares at
    // (Tables.events truncates nanos -> micros) — same guard as the
    // q_sessionize oracle against nano-precision event data
    "q_attribution" ->
      """SELECT p.event_id AS purchase_id, c.event_id AS click_id, p.user_id,
        | CAST(round(p.value*100, 0) AS BIGINT) AS value_cents
        |FROM events p JOIN events c
        | ON p.event_type = 'purchase' AND c.event_type = 'click'
        | AND c.user_id = p.user_id
        | AND epoch_us(c.ts) <= epoch_us(p.ts)
        | AND epoch_us(c.ts) >= epoch_us(p.ts) - CAST(14400000000 AS BIGINT)
        |ORDER BY purchase_id, click_id""".stripMargin,
    // RANGE frame bounds are epoch-microsecond offsets in both engines;
    // per-row cents keeps the windowed sum exact-integer and FP-order-free
    "q_rolling_window" ->
      """WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS us,
        |  CAST(round(value*100, 0) AS BIGINT) AS vc FROM events)
        |SELECT event_id, user_id,
        | count(*) OVER w AS n_1h,
        | CAST(sum(vc) OVER w AS BIGINT) AS cents_1h
        |FROM e
        |WINDOW w AS (PARTITION BY user_id ORDER BY us
        |  RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,
    "q_pivot" ->
      """SELECT user_id,
        | CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
        | CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error,
        | CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
        | CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
        | CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view
        |FROM events GROUP BY 1 ORDER BY user_id""".stripMargin,
    "q_rollup" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        | sum(l_quantity) AS sum_qty
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "q_sessionize" ->
      """WITH g AS (
        | SELECT user_id, ts, event_id,
        |  CASE WHEN lag(ts) OVER w IS NULL
        |   OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
        |  THEN 1 ELSE 0 END AS new_s
        | FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (
        | SELECT user_id, sum(new_s) OVER (
        |   PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sid
        | FROM g),
        |u AS (SELECT user_id, CAST(max(sid) AS BIGINT) AS n_sessions FROM s GROUP BY 1)
        |SELECT n_sessions, count(*) AS n_users FROM u GROUP BY 1 ORDER BY 1""".stripMargin,
    // The ok booleans are computed by Spark (|approx−exact| ≤ 2·rsd·exact);
    // the oracle pins them TRUE and checks the exact cardinalities itself.
    "q_hll" ->
      """SELECT 'l_orderkey' AS col_name, count(DISTINCT l_orderkey) AS exact_n,
        | TRUE AS ok FROM lineitem
        |UNION ALL
        |SELECT 'l_partkey', count(DISTINCT l_partkey), TRUE FROM lineitem
        |UNION ALL
        |SELECT 'l_suppkey', count(DISTINCT l_suppkey), TRUE FROM lineitem
        |ORDER BY col_name""".stripMargin,
    // ok booleans are Spark's sketch-vs-exact bound (pinned TRUE); the
    // exact per-source and global fingerprint cardinalities are DuckDB's
    "q_hll_sketch" ->
      """SELECT source, CAST(count(DISTINCT md5(text)) AS BIGINT) AS exact_n,
        | TRUE AS ok FROM documents GROUP BY source
        |UNION ALL
        |SELECT '__all__', CAST(count(DISTINCT md5(text)) AS BIGINT), TRUE
        |FROM documents
        |ORDER BY source""".stripMargin,
    // ok booleans are the Spark-side sketch-rank assertion (pinned TRUE);
    // the exact interpolated quantiles are DuckDB-verified directly
    "q_approx_quantiles" ->
      """SELECT CAST(0.25 AS DOUBLE) AS pct,
        | round(quantile_cont(l_extendedprice, 0.25), 4) AS exact_value,
        | TRUE AS ok FROM lineitem
        |UNION ALL SELECT 0.5, round(quantile_cont(l_extendedprice, 0.5), 4),
        | TRUE FROM lineitem
        |UNION ALL SELECT 0.75, round(quantile_cont(l_extendedprice, 0.75), 4),
        | TRUE FROM lineitem
        |UNION ALL SELECT 0.95, round(quantile_cont(l_extendedprice, 0.95), 4),
        | TRUE FROM lineitem
        |ORDER BY pct""".stripMargin
  )
}
