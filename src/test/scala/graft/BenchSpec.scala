package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench's spike-containment decisions (round 14) — pure functions,
  * pinned so the suite's self-defense can't silently regress: a driver
  * column charged ×13–22 one-shot sandbox stalls to queries two other
  * same-code runs read at 1–1.5 s (VERDICT r13 #2).
  */
class BenchSpec extends AnyFunSuite {

  test("shouldRetry: factor threshold with a 1 s absolute floor") {
    // no committed reference (new gate) — never retry
    assert(!Bench.shouldRetry(100.0, None, 3.0))
    // above 3x ref and above the floor — retry
    assert(Bench.shouldRetry(6.1, Some(2.0), 3.0))
    assert(!Bench.shouldRetry(5.9, Some(2.0), 3.0))
    // sub-second gates jitter past any ratio without being spikes:
    // 0.1 s ref, 0.9 s reading is 9x but under the floor — no retry
    assert(!Bench.shouldRetry(0.9, Some(0.1), 3.0))
    assert(Bench.shouldRetry(1.1, Some(0.1), 3.0))
    // boundary is strict
    assert(!Bench.shouldRetry(6.0, Some(2.0), 3.0))
  }

  test("upperMedian: odd counts true median, even counts the slower middle") {
    assert(Bench.upperMedian(Seq(3.0, 1.0, 2.0)) === 2.0)
    assert(Bench.upperMedian(Seq(4.0, 1.0, 2.0, 3.0)) === 3.0)
    assert(Bench.upperMedian(Seq(5.0)) === 5.0)
  }
}
