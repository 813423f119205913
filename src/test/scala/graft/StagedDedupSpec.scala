package graft

import org.apache.spark.sql.functions._

import graft.functions.Dedup

/** The staged (star + residual) keep/cluster verification equivalence —
  * the suite's single heaviest test (~6 min sequential: randomized
  * perturbed-copy corpora through both the staged and the pairs-derived
  * paths), isolated from FunctionsSpec (r17) so the parallel test groups
  * can schedule it alone. Same test, same assertions.
  */
class StagedDedupSpec extends SparkSpec {
  import spark.implicits._

  test("staged keep/cluster verification equals the pairs-derived forms " +
      "on NEAR-dup (perturbed-copy) corpora") {
    // The round-12 staged (star + residual) paths must be exact where no
    // identical-text collapse helps: groups of PERTURBED copies (every
    // pair similar but no two byte-identical), a bucket whose similar
    // pairs are NOT all star pairs (chain a~b~c with a!~c impossible at
    // jaccard, so use two sub-groups sharing LSH buckets), randomized
    // trials for shapes no fixture anticipates. Seeded: reproducible.
    val rnd = new scala.util.Random(2026)
    for (trial <- 1 to 3) {
      val rows = (0 until 6).flatMap { g =>
        val words = (1 to 50).map(i => s"g${g}w$i").toArray
        (0 until (2 + rnd.nextInt(6))).map { c =>
          val w = words.clone()
          // ~4% token substitution per copy; copy 0 verbatim
          if (c > 0) (1 to 2).foreach { _ =>
            w(rnd.nextInt(w.length)) = s"x${rnd.nextInt(1000)}"
          }
          ((g * 1000 + c * 37 + rnd.nextInt(10)).toLong, w.mkString(" "))
        }
      } ++ Seq((9001L, "solo body one"), (9002L, "solo body two"),
        (9003L, ""), (9004L, ""))
      val df = spark.createDataset(rows.distinct).toDF("doc_id", "text")
      // staged = Some(true) pins the star+residual branch (the round-13
      // small-input guard would otherwise route these tiny frames to the
      // all-pairs branch); staged = Some(false) pins that branch too, so
      // BOTH sides of the dispatch stay covered against the pairs form
      for (t <- Seq(0.7, 0.9); st <- Seq(Some(true), Some(false))) {
        val keepNew = Dedup.nearDupKeepCorpus(df, "doc_id", "text", t,
            staged = st)
          .select($"doc_id").as[Long].collect().toSet
        val keepOld = Dedup.nearDupKeepCorpusViaPairs(df, "doc_id", "text", t)
          .select($"doc_id").as[Long].collect().toSet
        assert(keepNew === keepOld, s"keep diverges trial=$trial t=$t st=$st")
        val cNew = Dedup.dupClusters(df, "doc_id", "text", t, staged = st)
          .as[(Long, Long)].collect().toMap
        val cOld = Dedup.dupClustersViaPairs(df, "doc_id", "text", t)
          .as[(Long, Long)].collect().toMap
        assert(cNew === cOld, s"clusters diverge trial=$trial t=$t st=$st")
      }
    }
    // NONEMPTY-residual construction: the bucket MINIMUM (id 100) is 6
    // substitutions away from the others (jaccard ~0.78 < 0.85 — every
    // star probe FAILS), while ids 101..105 are 1 substitution apart
    // (~0.93 >= 0.85 — similar only through NON-star pairs, reachable
    // exclusively via the phase-2 residual; bucket sharing between the
    // minimum and the group is ~certain at jac 0.78 over 24 bands).
    val words = (1 to 50).map(i => s"r$i").toArray
    def perturbed(id: Long, n: Int): (Long, String) = {
      val w = words.clone()
      (0 until n).foreach(k => w(k * 7) = s"sub${id}_$k")
      (id, w.mkString(" "))
    }
    val resDf = spark.createDataset(
      Seq(perturbed(100L, 6)) ++ (101L to 105L).map(perturbed(_, 1)) ++
        Seq((900L, "unrelated text body"))).toDF("doc_id", "text")
    // forced staged: this construction EXISTS to drive the phase-2
    // residual, which the small-input guard would otherwise bypass
    val kN = Dedup.nearDupKeepCorpus(resDf, "doc_id", "text", 0.85,
        staged = Some(true))
      .select($"doc_id").as[Long].collect().toSet
    val kO = Dedup.nearDupKeepCorpusViaPairs(resDf, "doc_id", "text", 0.85)
      .select($"doc_id").as[Long].collect().toSet
    assert(kN === kO)
    assert(kN === Set(100L, 101L, 900L), s"unexpected keep set $kN")
    val cN = Dedup.dupClusters(resDf, "doc_id", "text", 0.85,
        staged = Some(true))
      .as[(Long, Long)].collect().toMap
    val cO = Dedup.dupClustersViaPairs(resDf, "doc_id", "text", 0.85)
      .as[(Long, Long)].collect().toMap
    assert(cN === cO)
    assert((101L to 105L).map(cN).toSet === Set(101L) && cN(100L) === 100L)
  }
}
