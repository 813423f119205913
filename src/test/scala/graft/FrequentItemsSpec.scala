package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.operators.FrequentItems

class FrequentItemsSpec extends SparkSpec {
  import spark.implicits._

  private def items(xs: Seq[String]) = spark.createDataset(xs).toDF("item")

  test("exact regime: capacity >= distinct keys reproduces true counts") {
    val xs = Seq.fill(40)("a") ++ Seq.fill(25)("b") ++ Seq.fill(10)("c") ++
      (0 until 30).map(i => s"u$i")
    val got = FrequentItems.topKSketch(items(xs), $"item", capacity = 64, k = 3)
      .as[(String, Long, Long)].collect().toSeq
    // exact regime: counts exact and the published error floor is N/cap
    val floor = xs.length.toLong / 64L
    assert(got === Seq(("a", 40L, floor), ("b", 25L, floor), ("c", 10L, floor)))
  }

  test("sketch plan: partial (map-side) object aggregate, single final row") {
    val plan = FrequentItems.topKSketch(items(Seq("a", "b")), $"item", 8, 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate") || plan.contains("SortAggregate"),
      s"expected object aggregate, plan was:\n$plan")
    assert(plan.toLowerCase.contains("partial"),
      s"expected a partial aggregate stage, plan was:\n$plan")
  }

  test("property: Misra-Gries bounds hold under any input and tight capacity") {
    val gen = for {
      n <- Gen.chooseNum(0, 400)
      xs <- Gen.listOfN(n, Gen.oneOf(
        Gen.oneOf("h1", "h2", "h3"),                  // heavy hitters
        Gen.chooseNum(0, 200).map(i => s"t$i")))      // long tail
      cap <- Gen.chooseNum(4, 16)
    } yield (xs, cap)
    val prop = Prop.forAll(gen) { case (xs, cap) =>
      val truth = xs.groupBy(identity).view.mapValues(_.length.toLong).toMap
      val n = xs.length.toLong
      val rows = FrequentItems.topKSketch(items(xs), $"item", cap, k = cap)
        .as[(String, Long, Long)].collect()
      val got = rows.map(r => (r._1, r._2)).toMap
      val floor = n / cap.toLong
      // the operator publishes exactly this bound alongside every row
      val floorOk = rows.forall(_._3 == floor)
      // undercount only, by at most N/capacity
      val boundsOk = got.forall { case (t, c) =>
        c <= truth(t) && c >= truth(t) - floor }
      // no false negatives above the error floor
      val coverageOk = truth.forall { case (t, c) =>
        c <= floor || got.contains(t) }
      boundsOk && coverageOk && floorOk
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
  }

  test("sketch Column ignores null items (no encoder crash)") {
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq("a", null, "a", "b", null)
        .map(org.apache.spark.sql.Row(_))),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("item",
          org.apache.spark.sql.types.StringType))))
    val got = df.agg(FrequentItems.sketch($"item", 8).as("s"))
      .select(explode($"s")).as[(String, Long)].collect().toMap
    assert(got === Map("a" -> 2L, "b" -> 1L))
  }

  test("skew stress: 1M-row stream through capacity 16 keeps MG bounds") {
    // heavy hitters occupy ~90% of a million rows; the tail cycles through
    // 100k distinct items — far beyond capacity, so trims fire constantly.
    // Bounds must hold and the heavies must all survive.
    val df = spark.range(1000000L).select(
      when(col("id") % 10 < 9, concat(lit("h"), (col("id") % 3).cast("string")))
        .otherwise(concat(lit("t"), (col("id") % 100000L).cast("string")))
        .as("item"))
    val got = FrequentItems.topKSketch(df, $"item", capacity = 16, k = 16)
      .select($"item", $"approx_n").as[(String, Long)].collect().toMap
    val n = 1000000L
    val floor = n / 16L
    val truth = Map("h0" -> 300000L, "h1" -> 300000L, "h2" -> 300000L)
    truth.foreach { case (t, c) =>
      assert(got.contains(t), s"heavy hitter $t lost")
      assert(got(t) <= c && got(t) >= c - floor, s"$t count ${got(t)} vs $c")
    }
  }

  test("partition invariance in the exact regime") {
    val xs = (0 until 500).map(i => s"k${i % 17}")
    val a = FrequentItems.topKSketch(items(xs).repartition(1), $"item", 64, 17)
      .as[(String, Long, Long)].collect().toSeq
    val b = FrequentItems.topKSketch(items(xs).repartition(13), $"item", 64, 17)
      .as[(String, Long, Long)].collect().toSeq
    assert(a === b)
  }
}
