package graft

import org.apache.spark.sql.functions._

import graft.operators.TemporalJoins

/** As-of and range join vs locally-computed oracles, plus the plan-shape
  * guarantees (as-of compiles to a window, not a join; range join never
  * plans a nested-loop/cartesian).
  */
class TemporalJoinsSpec extends SparkSpec {
  import spark.implicits._

  private def tsDf(rows: Seq[(Long, Long, Long)], time: String, id: String) =
    rows.toDF("k", "__s", id)
      .select($"k", timestamp_seconds($"__s").as(time), col(id))

  test("asof backward: inclusive match, latest-wins, left-outer nulls") {
    val left = tsDf(Seq((1L, 10L, 100L), (1L, 20L, 101L), (1L, 4L, 102L),
      (2L, 50L, 103L)), "lt", "lid")
    val right = tsDf(Seq((1L, 5L, 200L), (1L, 10L, 201L), (1L, 15L, 202L)),
      "rt", "rid")
    val got = TemporalJoins.asofJoinBackward(left, right, Seq("k"), "lt", "rt")
      .select($"lid", $"rid")
      .as[(Long, Option[Long])].collect().toMap
    assert(got === Map(
      100L -> Some(201L), // equal timestamp is a match (inclusive)
      101L -> Some(202L), // latest of the three
      102L -> None,       // before any right row
      103L -> None))      // key with no right rows at all
  }

  test("asof tolerance nulls stale matches") {
    val left = tsDf(Seq((1L, 100L, 1L)), "lt", "lid")
    val right = tsDf(Seq((1L, 10L, 2L)), "rt", "rid")
    def run(tol: Option[Long]) =
      TemporalJoins.asofJoinBackward(left, right, Seq("k"), "lt", "rt", tol)
        .select($"rid").as[Option[Long]].head()
    assert(run(None) === Some(2L))
    assert(run(Some(90L)) === Some(2L)) // exactly at the horizon
    assert(run(Some(89L)) === None)
  }

  test("asof random data matches a local scan oracle; plan has no Join") {
    val rnd = new scala.util.Random(3)
    val left = Seq.fill(300)((rnd.nextInt(5).toLong, rnd.nextInt(1000).toLong))
      .zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) }
    val right = Seq.fill(120)((rnd.nextInt(5).toLong, rnd.nextInt(1000).toLong))
      .zipWithIndex.map { case ((k, t), i) => (k, t, 1000L + i) }
      .groupBy(r => (r._1, r._2)).map(_._2.head).toSeq // unique (key, time)
    val expected = left.map { case (k, t, lid) =>
      val m = right.filter(r => r._1 == k && r._2 <= t)
      lid -> (if (m.isEmpty) None else Some(m.maxBy(_._2)._3))
    }.toMap
    val df = TemporalJoins.asofJoinBackward(
      tsDf(left, "lt", "lid"), tsDf(right, "rt", "rid"), Seq("k"), "lt", "rt")
    assert(df.select($"lid", $"rid").as[(Long, Option[Long])]
      .collect().toMap === expected)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), "as-of must compile to a window, not a join")
  }

  test("asofJoinStreamStatic equals asofJoinBackward on random data (batch)") {
    val rnd = new scala.util.Random(9)
    val left = Seq.fill(200)((rnd.nextInt(4).toLong, rnd.nextInt(500).toLong))
      .zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) }
    val right = Seq.fill(80)((rnd.nextInt(4).toLong, rnd.nextInt(500).toLong))
      .zipWithIndex.map { case ((k, t), i) => (k, t, 1000L + i) }
      .groupBy(r => (r._1, r._2)).map(_._2.head).toSeq
    for (tol <- Seq(None, Some(50L))) {
      val a = TemporalJoins.asofJoinBackward(
        tsDf(left, "lt", "lid"), tsDf(right, "rt", "rid"),
        Seq("k"), "lt", "rt", tol)
        .select($"lid", $"rid").as[(Long, Option[Long])].collect().toMap
      val b = TemporalJoins.asofJoinStreamStatic(
        tsDf(left, "lt", "lid"), tsDf(right, "rt", "rid"),
        Seq("k"), "lt", "rt", tol)
        .select($"lid", $"rid").as[(Long, Option[Long])].collect().toMap
      assert(a === b, s"tol=$tol")
    }
  }

  test("rangeJoin equals the naive inequality join at several bucket widths") {
    val rnd = new scala.util.Random(7)
    val points = Seq.tabulate(200)(i =>
      (rnd.nextInt(3).toLong, rnd.nextInt(2000).toLong - 1000L, i.toLong))
      .toDF("k", "p", "pid")
    val ranges = Seq.tabulate(60) { i =>
      val lo = rnd.nextInt(2000).toLong - 1000L
      (rnd.nextInt(3).toLong, lo, lo + rnd.nextInt(300), 1000L + i)
    }.toDF("k", "lo", "hi", "rid")
    val naive = points.join(ranges, Seq("k"))
      .filter($"p" >= $"lo" && $"p" <= $"hi")
      .select($"pid", $"rid").as[(Long, Long)].collect().toSet
    for (w <- Seq(1L, 7L, 100L, 5000L)) {
      val got = TemporalJoins.rangeJoin(points, ranges, "p", "lo", "hi",
        bucketWidth = w, keys = Seq("k"))
      assert(got.select($"pid", $"rid").as[(Long, Long)].collect().toSet
        === naive, s"width=$w")
      assert(got.count() === naive.size.toLong, s"width=$w duplicates")
    }
    // keyless variant: every range applies to every point
    val naiveNoKey = points.crossJoin(ranges.withColumnRenamed("k", "k2"))
      .filter($"p" >= $"lo" && $"p" <= $"hi")
      .select($"pid", $"rid").as[(Long, Long)].collect().toSet
    val gotNoKey = TemporalJoins.rangeJoin(points.drop("k"),
      ranges.drop("k"), "p", "lo", "hi", bucketWidth = 100L)
    assert(gotNoKey.select($"pid", $"rid").as[(Long, Long)].collect().toSet
      === naiveNoKey)
  }

  test("asof edge cases: empty right, empty left, all-right-after-left") {
    val left = tsDf(Seq((1L, 10L, 1L)), "lt", "lid")
    val right = tsDf(Seq((1L, 20L, 2L)), "rt", "rid")
    val emptyR = right.filter($"rid" < 0)
    assert(TemporalJoins.asofJoinBackward(left, emptyR, Seq("k"), "lt", "rt")
      .select($"lid", $"rid").as[(Long, Option[Long])].collect().toSeq
      === Seq((1L, None)))
    assert(TemporalJoins.asofJoinBackward(left.filter($"lid" < 0), right,
      Seq("k"), "lt", "rt").count() === 0L)
    assert(TemporalJoins.asofJoinBackward(left, right, Seq("k"), "lt", "rt")
      .select($"rid").as[Option[Long]].head() === None)
    assert(TemporalJoins.asofJoinStreamStatic(left, emptyR, Seq("k"), "lt", "rt")
      .select($"lid", $"rid").as[(Long, Option[Long])].collect().toSeq
      === Seq((1L, None)))
  }

  test("rangeJoin plan has no nested-loop/cartesian; oversized span is loud") {
    val points = Seq((1L, 5L, 1L)).toDF("k", "p", "pid")
    val ranges = Seq((1L, 0L, 10L, 2L)).toDF("k", "lo", "hi", "rid")
    val plan = TemporalJoins.rangeJoin(points, ranges, "p", "lo", "hi",
      bucketWidth = 4L, keys = Seq("k")).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoop"))
    val huge = Seq((1L, 0L, 10000000L, 2L)).toDF("k", "lo", "hi", "rid")
    val e = intercept[Exception] {
      TemporalJoins.rangeJoin(points, huge, "p", "lo", "hi",
        bucketWidth = 1L, keys = Seq("k"), maxBucketsPerRange = 1000).count()
    }
    assert(e.getMessage != null)
  }
}
