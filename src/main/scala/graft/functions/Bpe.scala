package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Learned byte-pair-encoding tokenization (Sennrich, Haddow & Birch 2016,
  * "Neural Machine Translation of Rare Words with Subword Units" — public
  * algorithm). Complements [[Text.bpeTokens]], which is only the regex
  * PRE-tokenizer: here a learned merges table turns pre-tokens into real
  * subword tokens, so token counts driving chunking / cost estimates track
  * an actual tokenizer instead of upper-bounding it.
  *
  * Train: distributed word-frequency aggregation (one Spark shuffle over
  * pre-tokens, optionally capped to the top-V vocabulary — the merge loop
  * itself runs on the driver over the DISTINCT-word dict, exactly like
  * reference tokenizer trainers, and is O(vocab · merges)).
  *
  * Apply: canonical greedy apply — repeatedly merge the lowest-rank
  * adjacent pair present, merging all its occurrences left-to-right, until
  * no learned pair remains. Symbols are Unicode CODEPOINTS (not UTF-16
  * units), so segmentation agrees with engines that operate on codepoints
  * (the DuckDB oracle re-applies the same merges table in SQL).
  */
object Bpe {

  /** Split into codepoint symbols (surrogate-pair safe). */
  private def codepoints(word: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < word.length) {
      val cp = word.codePointAt(i)
      out += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    out.result()
  }

  /** Merge every left-to-right non-overlapping occurrence of (a,b). */
  private def mergeAll(syms: Vector[String], a: String, b: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var j = 0
    while (j < syms.length) {
      if (j < syms.length - 1 && syms(j) == a && syms(j + 1) == b) {
        out += a + b; j += 2
      } else { out += syms(j); j += 1 }
    }
    out.result()
  }

  /** Canonical apply: lowest-rank adjacent pair present is merged (all
    * occurrences) until no learned pair remains.
    */
  def segment(word: String, ranks: Map[(String, String), Int]): Vector[String] = {
    var syms = codepoints(word)
    while (syms.length >= 2) {
      var bestRank = Int.MaxValue
      var bestIdx = -1
      var i = 0
      while (i < syms.length - 1) {
        val r = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; bestIdx = i }
        i += 1
      }
      if (bestIdx < 0 || bestRank == Int.MaxValue) return syms
      syms = mergeAll(syms, syms(bestIdx), syms(bestIdx + 1))
    }
    syms
  }

  /** Learn `numMerges` merges from a word-frequency dict. Each round counts
    * adjacent symbol pairs weighted by word frequency and merges the most
    * frequent pair; ties break lexicographically so training is
    * deterministic regardless of partitioning.
    */
  def train(wordCounts: Seq[(String, Long)], numMerges: Int): Vector[(String, String)] = {
    var dict: Vector[(Vector[String], Long)] =
      wordCounts.iterator
        .map { case (w, n) => (codepoints(w), n) }
        .filter(_._1.length >= 2)
        .toVector
    val merges = Vector.newBuilder[(String, String)]
    var m = 0
    var exhausted = false
    while (m < numMerges && !exhausted) {
      val pairCounts = mutable.HashMap.empty[(String, String), Long]
      dict.foreach { case (syms, n) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          pairCounts.update(p, pairCounts.getOrElse(p, 0L) + n)
          i += 1
        }
      }
      if (pairCounts.isEmpty) exhausted = true
      else {
        val (a, b) = pairCounts.toSeq
          .minBy { case ((x, y), n) => (-n, x, y) }._1
        merges += ((a, b))
        dict = dict
          .map { case (syms, n) => (mergeAll(syms, a, b), n) }
          .filter(_._1.length >= 2)
        m += 1
      }
    }
    merges.result()
  }

  /** Distributed training front end: pre-tokenize with [[Text.bpePattern]],
    * aggregate word frequencies (one shuffle, partial-agg'd), keep the
    * top-`vocabCap` words by (count desc, word) — the driver dict is
    * bounded no matter the corpus size — then run the merge loop.
    */
  def trainOnCorpus(df: DataFrame, textCol: String, numMerges: Int,
      vocabCap: Int = 100000): Vector[(String, String)] = {
    val wc = df
      .select(explode(Text.bpeTokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w"))
      .limit(vocabCap)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .toSeq
    train(wc, numMerges)
  }

  /** Number of learned-BPE tokens for a text column: regex pre-tokenize,
    * then apply the merges per pre-token. UDF (the merge loop is
    * data-dependent iteration — not expressible in codegen'd functions);
    * the per-task memo cache amortizes segmentation to once per distinct
    * word, which is what makes the apply cheap on natural-language
    * corpora (Zipf: the top few thousand words cover most tokens).
    */
  def nBpeTokensLearned(c: Column, merges: Seq[(String, String)]): Column = {
    val ranks: Map[(String, String), Int] =
      merges.zipWithIndex.map { case (p, i) => (p, i) }.toMap
    val pattern = Text.bpePattern.r
    val f = udf { (text: String) =>
      if (text == null) 0L
      else {
        val memo = Memo.cacheFor(ranks)
        var n = 0L
        val it = pattern.findAllIn(text)
        while (it.hasNext) {
          val w = it.next()
          n += memo.getOrElseUpdate(w, segment(w, ranks).length.toLong)
        }
        n
      }
    }
    f(c)
  }

  /** Segmented tokens themselves (exploded-friendly array column). */
  def bpeTokensLearned(c: Column, merges: Seq[(String, String)]): Column = {
    val ranks: Map[(String, String), Int] =
      merges.zipWithIndex.map { case (p, i) => (p, i) }.toMap
    val pattern = Text.bpePattern.r
    val f = udf { (text: String) =>
      if (text == null) Array.empty[String]
      else pattern.findAllIn(text).flatMap(w => segment(w, ranks)).toArray
    }
    f(c)
  }

  /** Per-executor word→token-count memo, keyed by the CONTENT hash of the
    * ranks table (stable across task-closure deserializations) so two
    * different merges tables never share entries. Bounded: cleared when it
    * outgrows `maxEntries` (natural corpora plateau long before).
    */
  private object Memo {
    private val maxEntries = 1 << 20
    private val caches =
      new java.util.concurrent.ConcurrentHashMap[Int,
        java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]]()
    def cacheFor(ranks: Map[(String, String), Int]): MemoView = {
      val m = caches.computeIfAbsent(ranks.hashCode(),
        _ => new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]())
      if (m.size() > maxEntries) m.clear()
      new MemoView(m)
    }
  }

  private class MemoView(
      m: java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]) {
    def getOrElseUpdate(w: String, compute: => Long): Long = {
      val cached = m.get(w)
      if (cached != null) cached.longValue
      else { val v = compute; m.put(w, v); v }
    }
  }
}
