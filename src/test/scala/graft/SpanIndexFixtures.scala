package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.SpanIndex

/** Shared fixtures and result-shape helpers for the SpanIndex spec family.
  * r17: the former 35-test monster class is split into five classes
  * (build/serve, append, census, chained-batches, store-chain) so the
  * forked parallel test groups in build.sbt can spread its ~16 min of
  * sequential Spark work across JVMs — same tests, same assertions.
  */
trait SpanIndexFixtures extends SparkSpec {
  import spark.implicits._

  protected def docs(rows: (Long, String)*): DataFrame =
    rows.toDF("doc_id", "text")

  // shared 15-token block (longer than cap=6), a 5-token block, a
  // floor-length 3-token block, an end-of-doc block, identical docs, a
  // self-overlapping single-token run, an empty and a too-short doc
  protected lazy val corpus = docs(
    (1L, "L1 L2 L3 L4 L5 L6 L7 L8 L9 L10 L11 L12 L13 L14 L15 u1"),
    (2L, "z1 L1 L2 L3 L4 L5 L6 L7 L8 L9 L10 L11 L12 L13 L14 L15"),
    (3L, "a b c d e x1"),
    (4L, "a b c d e y1"),
    (5L, "p q r s"),
    (6L, "t p q r"),
    (7L, ""),
    (8L, "one two"),
    (9L, "dup1 dup2 dup3 dup4"),
    (10L, "dup1 dup2 dup3 dup4"),
    (11L, "dup1 dup2 dup3 dup4"),
    (12L, "a a a a a a a a"),
    (13L, "w1 e1 e2 e3"),
    (14L, "w2 e1 e2 e3"))

  protected def intervalsSet(df: DataFrame): Set[(Long, Int, Int, Int, String)] =
    df.as[(Long, Int, Int, Int, String)].collect().toSet

  protected def maskMap(df: DataFrame): Map[Long, (Long, Long, String)] =
    df.as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

  protected def indexSet(df: DataFrame): Set[(Long, Seq[Int], Seq[Int])] =
    df.select($"doc_id", $"positions", $"rlens")
      .as[(Long, Seq[Int], Seq[Int])].collect().toSet

  // derived per-gram counts (total occurrences, distinct docs) — the
  // census stores neither; both must fall out of grams ⋈ member counts
  protected def censusCounts(
      c: SpanIndex.SpanCensus): Map[Long, (Long, Long)] = {
    val m = c.members.groupBy($"__gid").agg(count(lit(1)).as("__m"))
    c.grams.join(m, Seq("__gid"))
      .groupBy($"__fh")
      .agg(sum($"__pcnt" * $"__m").as("occ"), sum($"__m").as("dc"))
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
  }

  // identical-text partition as member-id sets (gid values may legally
  // differ between an incrementally-updated census and a fresh one)
  protected def groupSets(c: SpanIndex.SpanCensus): Set[Set[Long]] =
    c.members.select($"__gid", $"__member").as[(Long, Long)].collect()
      .groupBy(_._1).values.map(_.map(_._2).toSet).toSet
}
