package graft.functions

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.storage.StorageLevel

import graft.operators.{BoundaryExchange, Release}

/** MULTI-threshold duplicate-span INDEX: one corpus pass that afterwards
  * answers [[Corpus.duplicateSpanIntervals]] / [[Corpus.maskDuplicateSpans]]
  * for EVERY `minLen` in a configured `[floor, cap]` band without touching
  * the census again — the interactive-threshold regime the per-minLen
  * census (one full pass per threshold) cannot serve.
  *
  * Algorithmic kin of the reference's suffix sorting
  * (/root/reference/examples/suffix_sorting/prefix_doubling.hpp — what a
  * suffix ORDER is for) and of Lee et al. 2021 (arXiv:2107.06499), whose
  * ExactSubstr tool builds one suffix array and serves any length
  * threshold from it. The Spark realization sidesteps a distributed
  * suffix-array construction entirely:
  *
  *   For token position p, let R(p) = the longest prefix of the suffix
  *   starting at p that occurs at >= minCount corpus positions counting
  *   p itself (within-document repeats count — ExactSubstr's occurrence
  *   semantics). A position q is inside a duplicated span
  *   of length >= L  iff  exists p <= q with R(p) >= max(L, q - p + 1),
  *   so the masked-position set at threshold L is exactly
  *   UNION of [p, p + R(p)) over p with R(p) >= L — the index is just
  *   the per-position R values.
  *
  * R is computed from a SINGLE global sort: in lexicographic suffix
  * order (over any injective alphabet relabeling — per-token xxhash64
  * here), all suffixes sharing a prefix are contiguous, so
  * R(p) = max(LCP with sorted predecessor, LCP with sorted successor).
  * No prefix-doubling rounds: suffix keys are CAPPED at `cap` tokens
  * (below), so a plain `repartitionByRange` + partition-local sort over
  * the capped keys is a correct suffix order for everything the index
  * can be asked.
  *
  * WHY the cap loses nothing for L <= cap (so intervals keep their TRUE
  * extent even when a span is longer than cap): with R~ = min(R, cap),
  * take q covered by [p, p + R(p)) with R(p) >= L. If q - p < cap then
  * R~(p) >= min(R(p), cap) >= min(max(L, q - p + 1), cap) suffices: both
  * L and q - p + 1 are <= cap, so the same p covers q under R~.
  * Otherwise let p' = q - cap + 1: a duplicated substring's suffixes are
  * duplicated too, so R decays by at most 1 per step (R(p+1) >= R(p)-1
  * within a document), giving R(p') >= R(p) - (p'-p) >= q - p' + 1 = cap,
  * hence R~(p') = cap >= L and [p', p' + cap) covers q. The capped union
  * therefore EQUALS the true union for every L in [floor, cap], and the
  * maximal islands — the interval outputs — are identical.
  *
  * The `floor` prunes the index: positions with R < floor (= their
  * floor-gram census count is 1) never enter the suffix sort, so on a
  * mostly-unique corpus the expensive step runs over the duplicated
  * minority only. Queries are valid for minLen in [floor, cap]
  * (enforced; the band is carried in the index schema).
  *
  * Index schema: `(<idCol>, positions array<int>, rlens array<int>,
  * __floor int, __cap int, __minc int)` — one row per document that has
  * any position with R >= floor; `positions` ascending 1-based token
  * starts, `rlens(i)` = min(R, cap) at that start.
  *
  * 100 TB posture, step by step: byte-identical documents COLLAPSE to
  * one representative before anything else (md5 group; census weighted
  * by group size, suffix rows duplicated min(m, minCount) times — the
  * proof of exactness is at the collapse site in
  * [[buildDuplicateSpanIndex]]; index rows re-expand to members at the
  * end), so an exact-dup-heavy crawl shrinks the whole build by the
  * duplication factor; tokenization is persisted once and
  * released after the consuming action; the floor census shuffles
  * (id, pos, hash64) scalars exactly like [[Corpus.maskDuplicateSpans]]
  * (8-byte keys, count >= minCount, auto-broadcast/shuffle per the same
  * plan-stats guard); candidate starts regroup per document so each
  * document's token-hash array travels ONCE into the slice step; the
  * suffix sort shuffles 8*cap bytes per CANDIDATE position (the one
  * deliberately heavy step — at cap=64 that is ~0.5 KiB per duplicated
  * token, and only duplicated tokens; an offline index build, amortized
  * over every threshold queried after); neighbor LCP is a partition-
  * local scan with a peer-to-peer one-row boundary exchange (the
  * net.Predecessor topology — the driver folds only per-partition
  * counts); the R aggregation shuffles (id, pos, lcp) scalars; the
  * per-document regroup is bounded by document length. QUERIES from the
  * index are one co-partitionable equi-join on the id plus per-row
  * array work — no census, no sort, no shuffle beyond the join. When
  * STORING the index, hash-distribute it on the id at a sane partition
  * count (`.repartition(n, col(id))`): the query's post-join per-row
  * work inherits the index scan's split count whenever the planner
  * broadcasts the documents side, so a single-file toy index serializes
  * it (measured 2x at sf1 — a toy-layout artifact; a corpus-scale index
  * has thousands of splits by itself).
  * Break-even vs the census: the build costs ~cap/3 censuses over the
  * duplicated fraction; three or more thresholds over a dup-minority
  * corpus and the index wins, one threshold and the census wins —
  * which is why both exist.
  *
  * Known limits (the census path covers it): counting is total
  * occurrences (any `minCount >= 2` via the c-window min emission on
  * [[buildDuplicateSpanIndex]]), not distinct documents — distinct-doc
  * thresholds need per-window doc-diversity state the single scan does
  * not carry.
  */
object SpanIndex {

  /** Build the index. See object doc for schema, semantics, and the
    * exactness proof. `broadcastDups` as in [[Corpus.maskDuplicateSpans]]:
    * None auto-selects from plan statistics.
    *
    * The returned frame is LAZY and its internal snapshots (tokenization,
    * sorted suffixes) are released after the FIRST action that touches
    * them — so before querying MULTIPLE thresholds, persist the result or
    * write it out and read it back (as q_span_index_multi and the
    * spanindex bench do). Serving several minLen values straight off the
    * un-persisted return value re-runs the entire suffix-sort build once
    * per query, and any unrelated Dataset action between build and first
    * use can drop the snapshots early.
    *
    * `minCount` generalizes the occurrence threshold (>= minCount total
    * occurrences, ExactSubstr counting): R_c(p) = the longest L such that
    * p's L-gram occurs >= c times = the max over windows of c CONSECUTIVE
    * suffixes (in sorted order) containing p of the window's min adjacent
    * LCP — computed in the same single scan by emitting each full
    * window's min to all c member positions and max-aggregating per
    * position (c=2 degenerates to the adjacent-pair emission). Emission
    * volume is c rows of (id, pos, lcp) scalars per candidate, so keep
    * minCount small (it is a duplication threshold, not a percentile);
    * the boundary exchange ships c-1 predecessor rows per partition.
    */
  def buildDuplicateSpanIndex(df: DataFrame, idCol: String, textCol: String,
      floor: Int = 8, cap: Int = 64, minCount: Int = 2,
      broadcastDups: Option[Boolean] = None): DataFrame = {
    require(floor >= 1, s"floor must be >= 1, got $floor")
    require(cap >= floor, s"cap must be >= floor; got cap=$cap floor=$floor")
    require(minCount >= 2 && minCount <= 4096,
      s"minCount must be in [2, 4096], got $minCount")
    val spark = df.sparkSession
    // identical-text COLLAPSE (the round-9 Dedup lesson applied to the
    // suffix sort): identical documents have identical R arrays, and a
    // group of m byte-identical copies contributes occurrence COUNT, not
    // information. Group by md5(text), run everything over the group
    // REPRESENTATIVES with (a) the floor census weighted by m (total
    // occurrences of a gram = sum of m over rep hits) and (b) each rep
    // suffix row duplicated min(m, minCount) times in the sort, then
    // re-expand index rows to members. Exactness of the min(m, c) copy
    // truncation: a window of c consecutive virtual suffixes takes
    // k_i <= c copies of any one suffix, and interior suffixes of a
    // window contribute ALL their copies, so a window is realizable over
    // the truncated copies iff it is realizable virtually, with the same
    // min-LCP (copies sort adjacent; LCP between copies is the full
    // capped key, which never undercuts a cross-row LCP). On a 100-copy
    // exact-dup corpus this shrinks the sort input 100x; on a dup-free
    // corpus it costs one (id, md5) scalar aggregate and two joins.
    val keyed = df.select(col(idCol),
      md5(coalesce(col(textCol).cast("string"), lit(""))).as("__gk"))
    val groups = keyed.groupBy(col("__gk"))
      .agg(min(col(idCol)).as("__rep"), count(lit(1)).as("__m"))
    val members = keyed.join(groups, Seq("__gk"))
      .select(col("__rep"), col(idCol).as("__member"))
    val reps = df.join(
        groups.select(col("__rep"), col("__m")),
        df(idCol) === col("__rep"))
      .select(col(idCol), col(textCol), col("__m"))
    val toks = reps
      .select(col(idCol), col("__m"), Text.tokens(col(textCol)).as("__toks"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // per-token 64-bit relabeling: suffix comparison over hash sequences
    // equals comparison over token sequences (tokens are space-free, so
    // token-sequence equality == gram-string equality), modulo 64-bit
    // collisions — the same birthday-bounded acceptance as the census
    // key in maskDuplicateSpans, and a collision can only OVER-mask.
    val th = toks.select(col(idCol), col("__m"),
      transform(col("__toks"), t => xxhash64(t)).as("__th"))

    // floor census over candidate starts: (rep, pos, hash(floor-slice))
    // scalars weighted by group size; >= minCount total occurrences
    // anywhere (ExactSubstr counting)
    val occ = th
      .filter(size(col("__th")) >= floor)
      .select(col(idCol), col("__m"), posexplode(
        transform(sequence(lit(1), size(col("__th")) - (floor - 1)),
          p => xxhash64(slice(col("__th"), p, lit(floor)))))
        .as(Seq("__i", "__fh")))
      .select(col(idCol), col("__m"), (col("__i") + 1).as("__p"), col("__fh"))
    val dup = occ.groupBy(col("__fh")).agg(sum(col("__m")).as("__n"))
      .filter(col("__n") >= minCount).select(col("__fh"))
    val doBroadcast = broadcastDups.getOrElse {
      val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
      val unknown =
        bytes == spark.sessionState.conf.defaultSizeInBytes
      unknown || bytes <= Corpus.BroadcastDupsMaxInputBytes
    }
    // same join posture as maskDuplicateSpans: the dup aggregate sits
    // above a stats-under-estimated explode — hint the non-broadcast
    // path instead of letting the static planner eagerly broadcast it
    val dupSide = if (doBroadcast) broadcast(dup) else dup.hint("shuffle_hash")
    val cand = occ.join(dupSide, Seq("__fh"), "left_semi")
      .groupBy(col(idCol)).agg(collect_list(col("__p")).as("__ps"))

    // capped suffix keys, one doc-array shipment per representative,
    // each suffix duplicated min(m, minCount) times (copies sort
    // adjacent and stand in for the group's occurrences — see the
    // collapse note above); the sort is the heavy step (8*cap bytes per
    // candidate) — see object doc
    val suffixes = th.join(cand, Seq(idCol))
      .select(col(idCol), col("__m"), explode(transform(col("__ps"),
        p => struct(p.as("p"), slice(col("__th"), p, lit(cap)).as("k"))))
        .as("__s"))
      .select(col(idCol), col("__s.p").as("__p"), col("__s.k").as("__key"),
        explode(sequence(lit(1L), least(lit(minCount.toLong), col("__m"))))
          .as("__cp"))
      .select(col(idCol), col("__p"), col("__key"))
      .repartitionByRange(col("__key"), col(idCol), col("__p"))
      .sortWithinPartitions(col("__key"), col(idCol), col("__p"))

    // persisted as a SERIALIZED Dataset cache on DISK, not an RDD
    // .cache() of deserialized Row objects: the suffix frame is 8*cap
    // bytes per candidate BEFORE Java object overhead — corpus-scale,
    // like a shuffle spill, and read three times (counts, boundary
    // tails, window scan). The Row-object cache OOM'd an 8 GiB heap at
    // sf10 (27M candidates, cap 16), and even a MEMORY_AND_DISK cache
    // starved concurrent aggregations of unified memory through
    // storage-unroll competition (AGGREGATE_OUT_OF_MEMORY at cap 24) —
    // the full-board sf10 column caught both. DISK_ONLY keeps the whole
    // unified-memory budget with execution; the re-reads are sequential
    // local-disk streams, shuffle-file economics.
    suffixes.persist(StorageLevel.DISK_ONLY)
    val idType = df.schema(idCol).dataType
    val keyIdx = 2
    val rdd = suffixes.rdd
    // c-1 predecessor rows per partition, peer-to-peer; every window of
    // c consecutive suffixes contributes its min adjacent LCP to ALL c
    // member positions' running max (c=2: each pair (a,b) contributes
    // lcp(a,b) to both endpoints), so no successor-side exchange is
    // needed — a window is computed in the partition owning its LAST row
    val (_, boundary) = BoundaryExchange.predecessors(rdd, minCount)
    val pairSchema = StructType(Seq(
      StructField(idCol, idType),
      StructField("__p", IntegerType, nullable = false),
      StructField("__l", IntegerType, nullable = false)))
    def lcp(a: Seq[Long], b: Seq[Long]): Int = {
      val n = math.min(a.length, b.length)
      var i = 0
      while (i < n && a(i) == b(i)) i += 1
      i
    }
    val c = minCount
    val pairRows = rdd.zipPartitions(boundary) { (it, bit) =>
      // ring of the last c (id, pos) rows and the c-1 adjacent LCPs
      // between them; O(c) state and O(c) work per row
      val ids = new Array[Any](c)
      val pss = new Array[Int](c)
      val lcs = new Array[Int](c - 1)
      var size = 0 // rows in the ring
      var head = 0 // slot of the oldest row
      var nl = 0 // LCPs in the ring
      var lh = 0 // slot of the oldest LCP
      var prevKey: Seq[Long] = null
      def push(r: Row, emit: Boolean): Iterator[Row] = {
        val k = r.getSeq[Long](keyIdx)
        if (prevKey != null) {
          val l = lcp(prevKey, k)
          if (nl == c - 1) { lcs(lh) = l; lh = (lh + 1) % (c - 1) }
          else { lcs((lh + nl) % (c - 1)) = l; nl += 1 }
        }
        if (size == c) { ids(head) = r.get(0); pss(head) = r.getInt(1); head = (head + 1) % c }
        else { ids((head + size) % c) = r.get(0); pss((head + size) % c) = r.getInt(1); size += 1 }
        prevKey = k
        if (emit && size == c) {
          var m = Int.MaxValue
          var i = 0
          while (i < c - 1) { val v = lcs((lh + i) % (c - 1)); if (v < m) m = v; i += 1 }
          val out = new Array[Row](c)
          i = 0
          while (i < c) { val s = (head + i) % c; out(i) = Row(ids(s), pss(s), m); i += 1 }
          out.iterator
        } else Iterator.empty
      }
      // boundary rows only warm the ring: a window ending at one lies
      // entirely in the predecessor partition, which already emitted it
      bit.foreach(r => push(r, emit = false))
      it.flatMap(r => push(r, emit = true))
    }
    val repIndex = spark.createDataFrame(pairRows, pairSchema)
      .groupBy(col(idCol), col("__p")).agg(max(col("__l")).as("__r"))
      // < floor only via a census hash collision (a candidate's
      // floor-gram is duplicated, so some suffix shares >= floor); such
      // rows would be dropped by every valid query's r >= minLen filter
      .filter(col("__r") >= floor)
      .groupBy(col(idCol))
      .agg(array_sort(collect_list(struct(col("__p"), col("__r"))))
        .as("__pr"))
      .select(col(idCol).as("__ridx"),
        transform(col("__pr"), x => x("__p")).as("positions"),
        transform(col("__pr"), x => x("__r")).as("rlens"))
    // re-expand representative rows to every group member (identical
    // text -> identical R array); (rep, member) scalar frame, never
    // text. A g-copy group fans g output rows out of one join key —
    // LINEAR in g (the index owes one row per member), the same
    // accepted single-key fan-out as the keep/cluster member joins in
    // Dedup; nothing here is quadratic in group size.
    val index = repIndex
      .join(members, repIndex("__ridx") === members("__rep"))
      .select(col("__member").as(idCol),
        col("positions"), col("rlens"),
        lit(floor).as("__floor"), lit(cap).as("__cap"),
        lit(minCount).as("__minc"))
    // the index's consuming action crosses an RDD boundary (the scan),
    // so plan containment can't identify either snapshot — unconditional
    // variant for both (the consuming variant would only ever hit its
    // 64-action leak backstop here)
    Release.datasetAfterNextAction(suffixes)
    Release.datasetAfterNextAction(toks)
    index
  }

  /** Masked-position array (sorted, 1-based) for one threshold, with the
    * band guard: minLen outside [floor, cap] raises at execution.
    */
  private def maskedAt(minLen: Int): org.apache.spark.sql.Column = {
    val covered = array_sort(array_distinct(flatten(transform(
      filter(arrays_zip(col("positions"), col("rlens")),
        x => x("rlens") >= minLen),
      x => sequence(x("positions"), x("positions") + x("rlens") - 1)))))
    when(lit(minLen).between(col("__floor"), col("__cap")), covered)
      .otherwise(raise_error(concat(
        lit(s"minLen $minLen outside index band ["),
        col("__floor"), lit(", "), col("__cap"), lit("]"))))
  }

  /** [[Corpus.duplicateSpanIntervals]] (occurrence counting at the
    * index's build `minCount`) served from a prebuilt index at ANY
    * `minLen` in its [floor, cap] band: same
    * `(<idCol>, span_start, span_end, span_len, span_text)` rows, but
    * the census and its corpus shuffle are replaced by one equi-join on
    * the id plus per-row array work.
    */
  def spanIntervalsFromIndex(index: DataFrame, docs: DataFrame,
      idCol: String, textCol: String, minLen: Int): DataFrame = {
    val toks = docs.select(col(idCol), Text.tokens(col(textCol)).as("__toks"))
    Corpus.islandSpans(
      toks.join(index, Seq(idCol))
        .withColumn("__ps", maskedAt(minLen))
        .filter(size(col("__ps")) > 0),
      idCol)
  }

  /** [[Corpus.maskDuplicateSpans]] (`countOccurrences=true` at the
    * index's build `minCount`) served from a prebuilt index: same
    * `(<idCol>, n_tokens, n_masked, clean_text)` rows for any `minLen`
    * in the band. Documents absent from the index (nothing duplicated)
    * keep their full text, exactly like the census path's left join.
    */
  def maskFromSpanIndex(index: DataFrame, docs: DataFrame,
      idCol: String, textCol: String, minLen: Int): DataFrame = {
    val toks = docs.select(col(idCol), Text.tokens(col(textCol)).as("__toks"))
    val masked = index.select(col(idCol), maskedAt(minLen).as("__mask"))
    Corpus.rebuildCleanText(
      toks.join(masked, Seq(idCol), "left"), idCol)
  }
}
