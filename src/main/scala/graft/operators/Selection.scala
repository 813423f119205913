package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed rank-k selection, mirroring the reference's Select example
  * (/root/reference/examples/select/select.hpp:54-188). The reference
  * iteratively brackets the k-th element between two random pivots until
  * the in-bracket population fits one worker; the Spark-first equivalent
  * brackets with `approxQuantile` (Greenwald–Khanna sketch, one pass) and
  * finishes with an exact filtered top-k — two passes total, no iteration.
  *
  * Scale posture: the bracket [lo, hi] contains O(eps·n) rows by the
  * sketch's rank guarantee; the final step is a TakeOrdered over only that
  * band, so nothing driver-side ever holds more than one value. At larger
  * n, shrink eps to keep the band bounded (eps = 1e-6 brackets ~100k rows
  * of a 100-billion-row table).
  */
object Selection {

  /** Exact value of 0-indexed `rank` in the ascending order of `valueCol`
    * (a Long column; duplicates count with multiplicity).
    */
  def selectRank(df: DataFrame, valueCol: String, rank: Long,
      eps: Double = 0.001): Long =
    selectRanks(df, valueCol, Seq(rank), eps).head._2

  /** Exact values at several ranks in ONE sketch pass + ONE counting pass:
    * all bracket probes go into a single `approxQuantile` call, all
    * below/in-band counts into a single aggregate, then each rank finishes
    * with a TakeOrdered over only its O(eps·n) band.
    *
    * `eps <= 0` auto-sizes the bracket so the band stays ≤ ~1M rows at any
    * n (and ≥ a floor that keeps the sketch guarantee meaningful), so the
    * same call works unchanged from 10^3 to 10^11 rows.
    */
  def selectRanks(df0: DataFrame, valueCol: String, ranks: Seq[Long],
      eps0: Double = 0.001): Seq[(Long, Long)] = {
    require(ranks.nonEmpty)
    // approxQuantile and the band counts ignore NULLs; count() must agree
    // with them or every rank past a NULL row would be shifted
    val df = df0.filter(col(valueCol).isNotNull)
    val n = df.count()
    require(ranks.forall(r => r >= 0 && r < n), s"ranks $ranks out of [0, $n)")
    val eps =
      if (eps0 > 0) eps0
      else math.max(1e-8, math.min(1e-3, 2.5e5 / math.max(n, 1L)))
    // probes at q ± 2eps with sketch error eps/2: lo's true rank is below
    // the target, hi's above, so the target value lies inside [lo, hi]
    val probes = ranks.flatMap { r =>
      val q = (r.toDouble + 0.5) / n
      Seq(math.max(0.0, q - 2 * eps), math.min(1.0, q + 2 * eps))
    }
    val bounds = df.stat.approxQuantile(valueCol, probes.toArray, eps / 2)
    val brackets = ranks.indices.map(i => (bounds(2 * i), bounds(2 * i + 1)))
    val aggs = brackets.flatMap { case (lo, hi) =>
      Seq(sum(when(col(valueCol) < lo, 1L).otherwise(0L)),
        sum(when(col(valueCol) >= lo && col(valueCol) <= hi, 1L).otherwise(0L)))
    }
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    // One finishing JOB for all ranks: each rank's TakeOrdered-over-band
    // subplan is unioned and collected once, instead of |ranks| serial
    // head() round-trips (on a busy cluster each action pays scheduler +
    // result-fetch latency; the union runs the per-rank stages under a
    // single action).
    val perRank = ranks.zip(brackets).zipWithIndex.map {
      case ((rank, (lo, hi)), i) =>
        val below0 = row.getLong(2 * i)
        val inBand0 = row.getLong(2 * i + 1)
        // the sketch's rank guarantee makes a miss ~impossible for
        // eps·n >~ 2; for tiny inputs fall back to the whole column
        val bracketOk = below0 <= rank && rank < below0 + inBand0
        val (band, below) =
          if (bracketOk)
            (df.filter(col(valueCol) >= lo && col(valueCol) <= hi), below0)
          else (df, 0L)
        val localRank = rank - below // rank within the band
        // limit() takes an Int: size eps so the bracketed band stays under
        // 2^31 rows (eps ~ 1e-6 brackets ~100k of 100 billion)
        require(localRank < Int.MaxValue - 1,
          s"band rank $localRank exceeds Int range — shrink eps (=$eps) for n=$n")
        // ascending top-(localRank+1), then the largest of those IS the
        // answer; both limits plan as TakeOrdered over the band only
        band.orderBy(col(valueCol)).limit((localRank + 1).toInt)
          .orderBy(col(valueCol).desc).limit(1)
          .select(lit(rank).as("rank"), col(valueCol).as("value"))
    }
    perRank.reduce(_ union _).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.sortBy(_._1)
  }
}
