package graft

/** Suite-wide physical-plan regression net: every declared query's
  * pre-execution plan must satisfy the [[PlanInvariants]] denylist — no
  * CartesianProduct, no unbounded BroadcastNestedLoopJoin, no
  * empty-partition Window, no over-bound planned broadcast. The per-op
  * plan asserts (FunctionsSpec, CorpusSpec) pin individual operators;
  * this sweep catches the NEXT eager-broadcast-trap-shaped regression at
  * commit time instead of one bench column late (the round-8 trap was
  * found by a warm sf1 column). Same sweep standalone at any SF:
  * `runMain graft.Explain check`.
  */
class PlanInvariantsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("all declared queries satisfy the physical-plan denylist") {
    // static plans only: AQE would wrap the tree in query stages (and at
    // runtime only ever improves on the static choice being audited)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val bad = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
        case (name, fn) =>
          PlanInvariants.check(fn(spark, sf),
              PlanInvariants.allow.getOrElse(name, Set.empty))
            .map(v => s"$name: $v")
      }
      assert(bad.isEmpty, "\n" + bad.mkString("\n"))
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("allowlist names only declared queries (no stale exemptions)") {
    val stale = PlanInvariants.allow.keySet -- SparkEntry.queries.keySet
    assert(stale.isEmpty, s"allowlist entries without a query: $stale")
  }
}
