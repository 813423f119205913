package graft.operators

/** Exact hypergeometric sampling backing the distributed exact-size Sample
  * (mirrors thrill/api/sample.hpp:50-263 +
  * common/hypergeometric_distribution.hpp): the driver splits the k sample
  * slots over partitions by drawing, for each partition in sequence, how
  * many of the remaining slots land in it —
  * `Hypergeometric(total remaining, slots remaining, partition size)`. The
  * driver therefore holds only the O(#partitions) allocation vector, never
  * the k indices themselves.
  *
  * Sampling is inverse-transform from the MODE outward: the log-pmf comes
  * from Stirling-series log-factorials (exact sum of logs below 256), and
  * probability mass is accumulated walking away from the mode, so the CDF
  * never underflows no matter how large the population — pmf(0) can be
  * e^-10000 at corpus scale while the mode region still carries all the
  * mass. Expected steps are O(standard deviation) per draw.
  */
object Hypergeometric {

  private def logFactorial(n: Long): Double =
    if (n < 2) 0.0
    else if (n < 256) {
      var s = 0.0; var i = 2L
      while (i <= n) { s += math.log(i.toDouble); i += 1 }
      s
    } else {
      // Stirling series; error ~ 1/(1680 n^7), negligible from n = 256 on
      val x = n.toDouble
      (x + 0.5) * math.log(x) - x + 0.5 * math.log(2.0 * math.Pi) +
        1.0 / (12.0 * x) - 1.0 / (360.0 * x * x * x) +
        1.0 / (1260.0 * x * x * x * x * x)
    }

  private def logChoose(a: Long, b: Long): Double =
    logFactorial(a) - logFactorial(b) - logFactorial(a - b)

  /** Number of marked items appearing in a uniform without-replacement draw
    * of `drawn` from `total` items of which `marked` are marked. Exact pmf;
    * deterministic given the rng state.
    */
  def draw(rng: scala.util.Random, total: Long, marked: Long, drawn: Long): Long = {
    require(marked >= 0 && marked <= total, s"marked=$marked total=$total")
    require(drawn >= 0 && drawn <= total, s"drawn=$drawn total=$total")
    if (marked == 0 || drawn == 0) return 0
    if (marked == total) return drawn
    if (drawn == total) return marked
    val lo = math.max(0L, drawn + marked - total)
    val hi = math.min(drawn, marked)
    if (lo == hi) return lo
    def lpmf(x: Long): Double =
      logChoose(marked, x) + logChoose(total - marked, drawn - x) -
        logChoose(total, drawn)
    val mode = math.max(lo, math.min(hi,
      ((drawn + 1).toDouble * (marked + 1).toDouble / (total + 2).toDouble).toLong))
    val u = rng.nextDouble()
    var acc = math.exp(lpmf(mode))
    if (u <= acc) return mode
    var d = 1L
    while (mode + d <= hi || mode - d >= lo) {
      if (mode + d <= hi) {
        acc += math.exp(lpmf(mode + d)); if (u <= acc) return mode + d
      }
      if (mode - d >= lo) {
        acc += math.exp(lpmf(mode - d)); if (u <= acc) return mode - d
      }
      d += 1
    }
    mode // fp residue (accumulated mass fell epsilon short of u)
  }

  /** Sequential split of `k` sample slots over blocks of the given sizes:
    * returns how many slots land in each block. Driver-side O(#blocks)
    * state and time O(k + #blocks) total (the inverse-transform walks sum
    * to ~k across all draws).
    */
  def split(rng: scala.util.Random, sizes: Array[Long], k: Long): Array[Long] = {
    val total = sizes.sum
    require(k >= 0 && k <= total, s"split($k) over $total elements")
    val alloc = new Array[Long](sizes.length)
    var nRem = total
    var kRem = k
    var p = 0
    while (p < sizes.length) {
      val x = draw(rng, nRem, kRem, sizes(p))
      alloc(p) = x
      nRem -= sizes(p)
      kRem -= x
      p += 1
    }
    alloc
  }
}
