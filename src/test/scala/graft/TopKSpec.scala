package graft

import org.apache.spark.sql.functions._

import graft.operators.TopK

class TopKSpec extends SparkSpec {
  import spark.implicits._

  private def refTopK(rows: Seq[(String, Double, Long)], k: Int) =
    rows.groupBy(_._1).toSeq.flatMap { case (key, g) =>
      g.sortBy(r => (-r._2, r._3)).take(k).zipWithIndex
        .map { case ((_, s, id), i) => (key, i + 1, id, s) }
    }.sortBy(r => (r._1, r._2))

  test("topKPerKey equals the sort-based reference, ties broken by id") {
    val rows = (0L until 400L).map(i =>
      (s"g${i % 5}", (i % 13).toDouble, i)) // many score ties
    val df = spark.createDataset(rows).toDF("key", "score", "id")
    val got = TopK.topKPerKey(df, Seq("key"), "score", "id", k = 4)
      .as[(String, Int, Long, Double)].collect().toSeq
      .sortBy(r => (r._1, r._2))
    assert(got === refTopK(rows, 4))
  }

  test("topKPerKey is partition-invariant") {
    val rows = (0L until 300L).map(i => (s"g${i % 3}", (i * 37 % 101).toDouble, i))
    val base = spark.createDataset(rows).toDF("key", "score", "id")
    val a = TopK.topKPerKey(base.repartition(1), Seq("key"), "score", "id", 5)
      .collect().map(_.toSeq).sortBy(_.toString)
    val b = TopK.topKPerKey(base.repartition(11, $"id"), Seq("key"), "score", "id", 5)
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(a.toSeq === b.toSeq)
  }

  test("topKPerKey: groups smaller than k, null scores dropped") {
    val df = Seq(
      ("a", Some(1.0), 1L), ("a", Some(2.0), 2L),
      ("b", None, 3L), ("b", Some(5.0), 4L)
    ).toDF("key", "score", "id")
    val got = TopK.topKPerKey(df, Seq("key"), "score", "id", k = 3)
      .as[(String, Int, Long, Double)].collect().sortBy(r => (r._1, r._2))
    assert(got.toSeq === Seq(("a", 1, 2L, 2.0), ("a", 2, 1L, 1.0), ("b", 1, 4L, 5.0)))
  }

  test("topKPerKey: NaN scores rank above +Inf and stay partition-invariant") {
    val rows = Seq(("a", Double.NaN, 1L), ("a", 5.0, 2L),
      ("a", Double.PositiveInfinity, 3L), ("a", Double.NaN, 4L))
    def run(parts: Int) = TopK.topKPerKey(
        spark.createDataset(rows).toDF("key", "score", "id").repartition(parts),
        Seq("key"), "score", "id", k = 3)
      .select($"id").as[Long].collect().toSeq
    // NaN > +Inf (java.lang.Double order, = Spark/DuckDB sort order),
    // NaN ties break by id
    assert(run(1) === Seq(1L, 4L, 3L))
    assert(run(7) === Seq(1L, 4L, 3L))
    // -0.0 ties 0.0 (SQL semantics) -> id tie-break, not 0.0-first
    val zeros = TopK.topKPerKey(
        spark.createDataset(Seq(("z", -0.0, 1L), ("z", 0.0, 2L)))
          .toDF("key", "score", "id"),
        Seq("key"), "score", "id", k = 1)
      .select($"id").as[Long].collect().toSeq
    assert(zeros === Seq(1L))
  }

  test("skew stress: one giant group (1M rows) holds only k per partition") {
    // the window form would sort all 1M rows in one reducer; the
    // aggregator's buffers stay O(k) per (key, partition) by construction
    // — this pins correctness (exact top-k of a million-row group) and
    // that the plan still partial-aggregates before the shuffle
    val df = spark.range(1000000L).select(lit("hot").as("key"),
      (col("id") * 2654435761L % 1000003L).cast("double").as("score"),
      col("id"))
    val got = TopK.topKPerKey(df, Seq("key"), "score", "id", k = 5)
      .select($"id", $"score").as[(Long, Double)].collect().toSeq
    val want = (0L until 1000000L)
      .map(i => (i, (i * 2654435761L % 1000003L).toDouble))
      .sortBy { case (id, s) => (-s, id) }.take(5)
    assert(got === want)
  }

  test("topKPerKey plan: partial ObjectHashAggregate, no Window sort") {
    val df = spark.createDataset((0L until 100L).map(i => (i % 3, i.toDouble, i)))
      .toDF("key", "score", "id")
    val plan = TopK.topKPerKey(df, Seq("key"), "score", "id", 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"),
      s"expected object hash aggregate, plan was:\n$plan")
    assert(plan.contains("partial_topkagg") || plan.contains("partial_TopKAgg")
        || plan.toLowerCase.contains("partial"),
      s"expected a partial (map-side) aggregate stage, plan was:\n$plan")
    assert(!plan.contains("Window"), s"no window sort allowed, plan was:\n$plan")
  }
}
