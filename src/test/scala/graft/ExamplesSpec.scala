package graft

import org.apache.spark.sql.functions._

import graft.examples.Examples

class ExamplesSpec extends SparkSpec {
  import spark.implicits._

  test("pageRank matches in-memory iteration on a small graph") {
    // 4-node graph with a dangling node (3)
    val edges = Seq((0L, 1L), (0L, 2L), (1L, 2L), (2L, 0L), (1L, 3L))
    val df = spark.createDataset(edges).toDF("src", "dst")
    val got = Examples.pageRank(df, iters = 15)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap

    // reference computation (same formulation, sequential)
    val nodes = (0L to 3L).toSeq
    val n = nodes.size.toDouble
    val out = edges.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val d = 0.85
    var rank = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 0 until 15) {
      val dangling = nodes.filterNot(out.contains).map(rank).sum
      val contrib = scala.collection.mutable.Map.empty[Long, Double].withDefaultValue(0.0)
      out.foreach { case (s, ds) => ds.foreach(t => contrib(t) += rank(s) / ds.size) }
      rank = nodes.map(v => v -> ((1 - d) / n + d * dangling / n + d * contrib(v))).toMap
    }
    nodes.foreach { v =>
      assert(math.abs(got(v) - rank(v)) < 1e-9, s"node $v: ${got(v)} vs ${rank(v)}")
    }
    // ranks sum to 1
    assert(math.abs(got.values.sum - 1.0) < 1e-9)
  }

  test("kMeans separates two obvious clusters") {
    val rng = new scala.util.Random(1)
    def around(c: Array[Float]): Array[Float] =
      c.map(x => x + rng.nextFloat() * 0.1f)
    val pts = (0L until 40L).map { i =>
      val base = if (i < 20) Array(0f, 0f, 0f, 0f) else Array(10f, 10f, 10f, 10f)
      (i, around(base))
    }
    val df = spark.createDataset(pts).toDF("id", "vec")
    val got = Examples.kMeans(df, "id", "vec", k = 2, iters = 5)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    val c0 = (0L until 20L).map(got).toSet
    val c1 = (20L until 40L).map(got).toSet
    assert(c0.size === 1)
    assert(c1.size === 1)
    assert(c0 != c1)
  }

  test("countTriangles on known graphs") {
    // triangle + extra edge: exactly 1 triangle
    val t1 = spark.createDataset(Seq((0L, 1L), (1L, 2L), (0L, 2L), (2L, 3L)))
      .toDF("src", "dst")
    assert(Examples.countTriangles(t1) === 1L)
    // K4 has 4 triangles; also include reversed duplicates to test orienting
    val k4 = for {
      i <- 0L to 3L; j <- 0L to 3L if i != j
    } yield (i, j)
    val t2 = spark.createDataset(k4).toDF("src", "dst")
    assert(Examples.countTriangles(t2) === 4L)
  }

  test("bfs computes shortest hop counts incl. unreachable nodes absent") {
    // path 0→1→2→3 plus shortcut 0→2; node 9 isolated
    val edges = spark.createDataset(Seq(
      (0L, 1L), (1L, 2L), (2L, 3L), (0L, 2L), (9L, 9L))).toDF("src", "dst")
    val got = Examples.bfs(edges, 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got === Map(0L -> 0L, 1L -> 1L, 2L -> 1L, 3L -> 2L))
  }

  test("logisticRegression separates a linearly separable set") {
    // classes mirrored through the origin so the zero-init boundary is
    // already unbiased and a few GD steps suffice
    val pts = spark.createDataset(
      (0 until 200).map { i =>
        val y = i % 2
        val sign = if (y == 1) 1.0 else -1.0
        (i.toLong, y.toDouble, sign * (i % 10 + 1), sign * (i % 7 + 1))
      }).toDF("id", "y", "x1", "x2")
    val w = Examples.logisticRegression(pts, Seq("x1", "x2"), "y", iters = 10, lr = 0.1)
    val correct = pts.collect().count { r =>
      val z = w(0) + w(1) * r.getDouble(2) + w(2) * r.getDouble(3)
      (if (z > 0) 1.0 else 0.0) == r.getDouble(1)
    }
    assert(correct === 200, s"only $correct/200 classified correctly")
  }

  test("suffixArray of 'banana' matches the classic answer") {
    val got = Examples.suffixArray("banana", spark)
      .orderBy("pos").collect().map(_.getLong(1)).toSeq
    // suffixes sorted: a(5), ana(3), anana(1), banana(0), na(4), nana(2)
    assert(got === Seq(5L, 3L, 1L, 0L, 4L, 2L))
  }

  test("teraSort produces globally sorted output across partitions") {
    val rng = new scala.util.Random(5)
    val recs = (0 until 5000).map(_ => (rng.nextLong(), rng.nextInt()))
    val df = spark.createDataset(recs).toDF("key", "payload").repartition(13)
    val sorted = Examples.teraSort(df, "key").select("key").collect().map(_.getLong(0))
    assert(sorted.toSeq === recs.map(_._1).sorted.toSeq)
  }
}
