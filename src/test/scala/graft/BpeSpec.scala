package graft

import graft.functions.{Bpe, BpeFixture, Text}
import org.apache.spark.sql.functions._

class BpeSpec extends SparkSpec {
  import spark.implicits._

  private def ranksOf(merges: Seq[(String, String)]): Map[(String, String), Int] =
    merges.zipWithIndex.map { case (p, i) => (p, i) }.toMap

  test("train reproduces the classic Sennrich example deterministically") {
    // word-frequency dict from the paper's running example shape
    val wc = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
    val merges = Bpe.train(wc, 6)
    // round-by-round: (e,s)/(s,t) tie at 9 -> lex; then est; l-o/o-w tie
    // at 7 -> lex; then low; e-w/n-e/w-est tie at 6 -> lex; then ew+est
    assert(merges === Vector(("e", "s"), ("es", "t"), ("l", "o"),
      ("lo", "w"), ("e", "w"), ("ew", "est")))
  }

  test("segment applies lowest-rank-first (canonical), not rank-order pass") {
    // one pass in rank order would give [x, abc]; canonical BPE backtracks
    // to the lower-rank (x,ab) the rank-2 merge just enabled
    val merges = Seq(("x", "ab"), ("a", "b"), ("ab", "c"))
    assert(Bpe.segment("xabc", ranksOf(merges)) === Vector("xab", "c"))
    // merge-all is left-to-right non-overlapping
    assert(Bpe.segment("aaa", ranksOf(Seq(("a", "a")))) === Vector("aa", "a"))
    // unknown chars pass through untouched
    assert(Bpe.segment("zq", ranksOf(merges)) === Vector("z", "q"))
    // classic: lowest
    val m2 = Bpe.train(Seq(("low", 5L), ("lower", 2L), ("newest", 6L),
      ("widest", 3L)), 6)
    assert(Bpe.segment("lowest", ranksOf(m2)) === Vector("low", "est"))
  }

  test("segment is surrogate-pair safe (codepoint symbols)") {
    val emoji = new String(Character.toChars(0x1F600)) // non-BMP
    assert(Bpe.segment(emoji + "ab", ranksOf(Seq(("a", "b")))) ===
      Vector(emoji, "ab"))
  }

  test("column apply equals direct per-word segmentation; counts exceed pre-tokens") {
    val ranks = ranksOf(BpeFixture.merges)
    val docs = Tables.documents(spark, "/root/testdata/sf0.001").limit(50)
    val got = docs.select($"doc_id", $"text",
        Bpe.nBpeTokensLearned($"text", BpeFixture.merges).as("n_learned"),
        Text.nBpeTokens($"text").as("n_pre"))
      .collect()
    val pat = Text.bpePattern.r
    got.foreach { r =>
      val want = pat.findAllIn(r.getString(1))
        .map(w => Bpe.segment(w, ranks).length.toLong).sum
      assert(r.getLong(2) === want, s"doc ${r.getLong(0)}")
      // merges were trained on this corpus: subword count must sit between
      // pre-tokens (all merged) and codepoints (none merged)
      assert(r.getLong(2) >= r.getLong(3))
    }
    // and the table differs materially from the pre-token count overall
    val sums = docs.agg(
      sum(Bpe.nBpeTokensLearned($"text", BpeFixture.merges)).as("l"),
      sum(Text.nBpeTokens($"text")).as("p")).head()
    assert(sums.getLong(0) > sums.getLong(1))
  }

  test("trainOnCorpus: distributed word count feeds the driver merge loop") {
    val df = Seq.fill(20)("the low lowest newest").toDF("text")
    val merges = Bpe.trainOnCorpus(df, "text", 4)
    assert(merges.length === 4)
    // deterministic across reruns and partitionings
    assert(Bpe.trainOnCorpus(df.repartition(7), "text", 4) === merges)
  }
}
