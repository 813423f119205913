package graft

import org.apache.spark.sql.functions._

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.functions.{Corpus, Text}
import graft.operators.TopK

/** Randomized property checks against in-memory reference computations —
  * the Spark analog of the reference's random-input-vs-std::sort tests
  * (SURVEY.md §5, e.g. sort_node_test.cpp SortRandomIntegers). Raw
  * ScalaCheck (no scalatest bridge in the offline cache): each property
  * runs N generated cases through real Spark plans on the multi-partition
  * test session.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def check(name: String, cases: Int, p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(cases), p)
    assert(res.passed, s"$name: ${res.status}")
  }

  private val token: Gen[String] = Gen.oneOf("a", "b", "c", "dd", "eee", "f0")
  private val text: Gen[String] = Gen.listOf(token).map(_.mkString(" "))

  test("property: topKPerKey equals in-memory sort reference") {
    val rows = Gen.listOf(for {
      k <- Gen.oneOf("k0", "k1", "k2")
      s <- Gen.chooseNum(-5, 5).map(_.toDouble)
      id <- Gen.chooseNum(0L, 1000L)
    } yield (k, s, id)).map(_.distinctBy(_._3)) // unique ids
    // k spans both buffer regimes: tiny (heap barely fills) and larger
    // than most groups (everything kept, pure insert path)
    check("topk", 15, Prop.forAll(rows, Gen.chooseNum(1, 40)) { (rs, k) =>
      val want = rs.groupBy(_._1).toSeq.flatMap { case (key, g) =>
        g.sortBy(r => (-r._2, r._3)).take(k).zipWithIndex
          .map { case ((_, s, id), i) => (key, i + 1, id, s) }
      }.sorted
      val got =
        if (rs.isEmpty) Nil
        else TopK.topKPerKey(spark.createDataset(rs).toDF("key", "score", "id"),
          Seq("key"), "score", "id", k)
          .as[(String, Int, Long, Double)].collect().toSeq.sorted
      got == want
    })
  }

  test("property: repetitionStats equals in-memory reference") {
    val docsGen = Gen.listOf(text).map(_.zipWithIndex.map { case (t, i) => (i.toLong, t) })
    check("repetition", 15, Prop.forAll(docsGen) { ds =>
      val want = ds.map { case (id, t) =>
        val toks = t.split(" ").filter(_.nonEmpty)
        val top = if (toks.isEmpty) 0L
          else toks.groupBy(identity).values.map(_.length).max.toLong
        val frac = if (toks.isEmpty) 0.0
          else BigDecimal(top.toDouble / toks.length)
            .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
        (id, toks.length.toLong, top, frac)
      }.sorted
      val got =
        if (ds.isEmpty) Nil
        else Corpus.repetitionStats(spark.createDataset(ds).toDF("doc_id", "text"),
          "doc_id", "text")
          .as[(Long, Long, Long, Double)].collect().toSeq.sorted
      got == want
    })
  }

  test("property: shinglesOfTokens equals sliding-window reference") {
    val arrGen = Gen.listOf(token)
    check("shingles", 15, Prop.forAll(arrGen, Gen.chooseNum(1, 4)) { (toks, n) =>
      val want = toks.sliding(n).filter(_.length == n)
        .map(_.mkString(" ")).toSeq.distinct.sorted
      val got = spark.createDataset(Seq(toks)).toDF("toks")
        .select(Text.shinglesOfTokens($"toks", n))
        .head().getSeq[String](0).sorted
      got == want
    })
  }

  test("property: TokenCount expression equals split+filter+size on arbitrary strings") {
    // arbitrary unicode + spaces, incl. leading/trailing/multi-space runs
    val gen = Gen.listOf(Gen.oneOf(
      Gen.const(" "), Gen.const("  "), token, Gen.const("日本語"),
      Gen.const("naïve"), Gen.const("'"), Gen.const("\t")))
      .map(_.mkString(""))
    check("ntokens", 20, Prop.forAll(gen) { s =>
      val got = spark.createDataset(Seq(s)).toDF("t")
        .select(graft.functions.TokenCount.token_count($"t"),
          size(filter(split($"t", " "), x => x =!= lit(""))).cast("long"))
        .as[(Long, Long)].head()
      got._1 == got._2
    })
  }

  test("property: chunkDocs equals in-memory chunking reference") {
    val gen = for {
      toks <- Gen.listOf(token)
      window <- Gen.chooseNum(1, 8)
      stride <- Gen.chooseNum(1, window)
    } yield (toks, window, stride)
    check("chunk", 20, Prop.forAll(gen) { case (toks, window, stride) =>
      val n = toks.length
      val nChunks = if (n == 0) 0
        else if (n <= window) 1
        else (n - window + stride - 1) / stride + 1
      val want = (0 until nChunks).map { i =>
        val chunk = toks.slice(i * stride, i * stride + window)
        (i, chunk.mkString(" "), chunk.length.toLong)
      }
      val got = Corpus.chunkDocs(
          spark.createDataset(Seq((7L, toks.mkString(" ")))).toDF("doc_id", "text"),
          "doc_id", "text", window, stride)
        .select($"chunk_idx", $"chunk_text", $"n_chunk_tokens")
        .as[(Int, String, Long)].collect().toSeq.sortBy(_._1)
      got == want
    })
  }

  test("property: heavyHitters equals in-memory counted reference") {
    val docsGen = Gen.listOf(text).map(_.zipWithIndex.map { case (t, i) => (i.toLong, t) })
    check("heavy", 15, Prop.forAll(docsGen, Gen.chooseNum(1, 5)) { (ds, k) =>
      val counts = ds.flatMap(_._2.split(" ")).filter(_.nonEmpty)
        .groupBy(identity).view.mapValues(_.length.toLong).toSeq
      val want = counts.sortBy { case (t, n) => (-n, t) }.take(k)
      val got =
        if (ds.isEmpty) Nil
        else Corpus.heavyHitters(spark.createDataset(ds).toDF("doc_id", "text"),
          "text", k).as[(String, Long)].collect().toSeq
      got == want
    })
  }

  test("property: cdcChunks tiles [1,n] and reassembles the token stream") {
    val docsGen = Gen.listOf(text).map(_.zipWithIndex
      .map { case (t, i) => (i.toLong, t) })
    check("cdc", 15, Prop.forAll(docsGen, Gen.chooseNum(1, 6)) { (ds, w) =>
      val got =
        if (ds.isEmpty) Nil
        else Corpus.cdcChunks(
            spark.createDataset(ds).toDF("doc_id", "text"), "doc_id", "text", w)
          .select("doc_id", "chunk_idx", "tok_start", "tok_end", "n_tok")
          .as[(Long, Int, Int, Int, Long)].collect().toSeq
          .sortBy(r => (r._1, r._2))
      ds.forall { case (id, t) =>
        val n = t.split(" ").count(_.nonEmpty)
        val cs = got.filter(_._1 == id)
        if (n == 0) cs.isEmpty
        else cs.nonEmpty && cs.head._3 == 1 && cs.last._4 == n &&
          cs.map(_._5).sum == n.toLong &&
          cs.zipWithIndex.forall { case ((_, ci, _, _, _), i) => ci == i } &&
          cs.sliding(2).forall {
            case Seq(a, b) => b._3 == a._4 + 1
            case _ => true
          }
      }
    })
  }

  test("property: line segmentation + scrub reassembly invariants") {
    // docs: random multi-line texts incl. blank and whitespace-only lines
    val line: Gen[String] = Gen.oneOf("", " ", "alpha beta", "x", "shared line",
      "gamma  delta", "\t", "shared line") // "shared line" generated often
    val doc: Gen[String] = Gen.listOf(line).map(_.mkString("\n"))
    val docsGen: Gen[List[String]] = Gen.listOfN(8, doc)
    check("line-scrub", 30, Prop.forAll(docsGen) { texts =>
      val df = spark.createDataset(texts.zipWithIndex
        .map { case (t, i) => (i.toLong, t) }).toDF("doc_id", "text")
      // reference: per doc, non-blank lines in order. Blank = SPACE-only:
      // Spark's trim (and DuckDB's) strips 0x20 only, so a tab-only line
      // is a (kept) segment — the engine-portable convention the oracle
      // shares.
      val ref = texts.map(_.split("\n", -1).toSeq
        .filter(_.exists(_ != ' ')))
      val segs = Corpus.lineSegments(df, "doc_id", "text")
        .select($"doc_id", $"chunk_idx", $"chunk_text")
        .as[(Long, Int, String)].collect()
        .groupBy(_._1).map { case (k, v) => k -> v.sortBy(_._2).map(_._3).toSeq }
      val segsOk = ref.zipWithIndex.forall { case (want, i) =>
        segs.getOrElse(i.toLong, Seq.empty) == want
      }
      // scrub with minDocs above any possible frequency = identity
      // (blank lines dropped); n_segments counts non-blank lines
      val scrub = Corpus.scrubBoilerplateLines(df, "doc_id", "text",
          minDocs = 1000L)
        .select($"doc_id", $"n_segments", $"n_dropped", $"clean_text")
        .as[(Long, Long, Long, String)].collect().map(r => r._1 -> r).toMap
      val scrubOk = ref.zipWithIndex.forall { case (want, i) =>
        val (_, n, d, clean) = scrub(i.toLong)
        n == want.size && d == 0L && clean == want.mkString("\n")
      }
      segsOk && scrubOk
    })
  }

  test("property: splitByHash labels exactly per the hex-grid thresholds") {
    val idsGen = Gen.listOf(Gen.chooseNum(-1000L, 1000L)).map(_.distinct)
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    check("split", 15, Prop.forAll(idsGen) { ids =>
      ids.isEmpty || {
        val df = spark.createDataset(ids.map((_, "t"))).toDF("doc_id", "text")
        val got = Corpus.splitByHash(df, "doc_id", "s9",
            Seq("a" -> 0.5, "b" -> 0.25, "c" -> 0.25))
          .select("doc_id", "split").as[(Long, String)].collect().toMap
        ids.forall { id =>
          val b = md5hex(s"s9:$id").take(4)
          val want = if (b < "8000") "a" else if (b < "c000") "b" else "c"
          got(id) == want
        }
      }
    })
  }

  test("property: gearChunkBytes boundaries equal the local gear walk") {
    import graft.functions.{Corpus, GearCdc}
    val payload: Gen[Array[Byte]] = Gen.chooseNum(0, 600).flatMap { len =>
      Gen.containerOfN[Array, Byte](len, Gen.chooseNum(-128, 127).map(_.toByte))
    }
    val payloads: Gen[List[Array[Byte]]] =
      Gen.chooseNum(1, 6).flatMap(n => Gen.listOfN(n, payload))
    check("gear", 15, Prop.forAll(payloads, Gen.chooseNum(2, 8),
        Gen.chooseNum(1, 32)) { (ps, maskBits, minSize) =>
      val rows = ps.zipWithIndex.map { case (p, i) => (i.toLong, p) }
      val got = Corpus.gearChunkBytes(
          spark.createDataset(rows).toDF("doc_id", "bytes"), "doc_id",
          col("bytes"), maskBits, minSize)
        .select("doc_id", "byte_end").as[(Long, Long)].collect().toSeq
        .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
      rows.forall { case (id, p) =>
        got.getOrElse(id, Nil) == GearCdc.boundaries(p, maskBits, minSize).toSeq
      }
    })
  }

  test("property: AVI writer/walker roundtrip for arbitrary frame payloads") {
    import graft.multimodal.Multimodal
    // arbitrary payload bytes and sizes (incl. 0 and odd lengths — odd
    // chunks exercise RIFF even-padding), arbitrary frame counts and
    // header dims; a pure local property, no Spark plan needed
    val frame: Gen[Array[Byte]] = Gen.chooseNum(0, 97).flatMap { len =>
      Gen.containerOfN[Array, Byte](len, Gen.chooseNum(-128, 127).map(_.toByte))
    }
    val frames: Gen[List[Array[Byte]]] = Gen.chooseNum(1, 12)
      .flatMap(n => Gen.listOfN(n, frame))
    check("avi", 60, Prop.forAll(frames, Gen.chooseNum(1, 640),
        Gen.chooseNum(1, 480)) { (fs, w, h) =>
      val demuxed = Multimodal.aviFrames(0L,
        Multimodal.buildAvi(w, h, fs))
      demuxed.size == fs.size &&
        demuxed.zip(fs).forall { case (a, b) => a.sameElements(b) }
    })
  }
}
