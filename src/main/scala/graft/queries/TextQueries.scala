package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.{Dedup, Similarity, Text}

/** Training-data pipeline queries over `documents` / `embeddings`:
  * dedup (exact, MinHash+LSH, SimHash), text quality/token analysis,
  * fingerprinting, language ID, cosine similarity + ANN.
  *
  * Oracle notes: jaccard/cosine are computed from exact integer set sizes /
  * float→double promoted arithmetic, so a 4-decimal round is stable across
  * engines. MinHash signatures and SimHash use engine-local hashing, so
  * those queries are rows-only checks — EXCEPT q_near_dup_pairs, whose
  * output is the *verified* (exact-jaccard) pair set: with 24 bands × 4
  * rows the LSH miss probability at j≥0.8 is ~3e-6 per pair, so the result
  * equals the brute-force oracle.
  */
object TextQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // exact dedup via content hash (hash-groupBy, one shuffle)
    "q_dedup_exact" -> ((s, d) => {
      import s.implicits._
      Dedup.exactDedupKeep(Tables.documents(s, d), "doc_id", Seq(md5($"text").as("h")))
        .select($"h", $"n", $"keep_id")
        .orderBy($"h")
    }),

    // normalized-text fingerprint (md5 + the codegen'd rolling hash is
    // exercised in tests; md5 here because both engines share it)
    "q_fingerprint" -> ((s, d) => {
      import s.implicits._
      Tables.documents(s, d)
        .select($"doc_id", Text.fingerprint($"text").as("fp"))
        .orderBy($"doc_id")
    }),

    // token/quality counters (all codegen'd column functions, no UDF)
    "q_text_stats" -> ((s, d) => {
      import s.implicits._
      Tables.documents(s, d).select(
        $"doc_id",
        Text.nTokens($"text").as("n_tokens"),
        size(Text.tokenSet($"text")).cast("long").as("n_uniq"),
        Text.punctCount($"text").as("punct_n"),
        Text.digitCount($"text").as("digit_n"),
        Text.upperCount($"text").as("upper_n"))
        .orderBy($"doc_id")
    }),

    // near-dup: MinHash → LSH bucket join → exact-jaccard verification
    "q_near_dup_pairs" -> ((s, d) => {
      import s.implicits._
      Dedup.verifiedNearDupPairs(Tables.documents(s, d), "doc_id", "text",
          threshold = 0.8)
        .select($"id_a".as("doc_a"), $"id_b".as("doc_b"),
          round($"jaccard", 4).as("jaccard"))
        .orderBy($"doc_a", $"doc_b")
    }),

    // pairwise bigram-shingle jaccard of adjacent doc ids (n-gram jaccard)
    "q_jaccard_adjacent" -> ((s, d) => {
      import s.implicits._
      val sets = Tables.documents(s, d)
        .select($"doc_id", Text.tokens($"text").as("__toks"))
        .select($"doc_id", Text.shinglesOfTokens($"__toks", 2).as("ws"))
      val a = sets.select($"doc_id".as("doc_a"), $"ws".as("ws_a"))
      val b = sets.select(($"doc_id" - 1).as("doc_a"), $"doc_id".as("doc_b"), $"ws".as("ws_b"))
      val inter = size(array_intersect($"ws_a", $"ws_b")).cast("double")
      val uni = (size($"ws_a") + size($"ws_b")).cast("double") - inter
      a.join(b, "doc_a")
        .select($"doc_a", $"doc_b", round(inter / uni, 4).as("jaccard"))
        .orderBy($"doc_a")
    }),

    // SimHash signatures (engine-local hashing → rows-only check)
    "q_simhash" -> ((s, d) => {
      import s.implicits._
      Tables.documents(s, d)
        .select($"doc_id", Dedup.simHash(Text.tokens($"text")).as("simhash"))
        .orderBy($"doc_id")
    }),

    // language ID heuristic (rows-only; accuracy asserted in tests)
    "q_lang_id" -> ((s, d) => {
      import s.implicits._
      Tables.documents(s, d)
        .select($"doc_id", Text.langId($"text").as("lang_pred"))
        .orderBy($"doc_id")
    }),

    // cosine of adjacent embedding ids — float→double promoted, exact ops
    "q_cosine_pairs" -> ((s, d) => {
      import s.implicits._
      val e = Tables.embeddings(s, d)
      val a = e.select($"vec_id".as("vec_a"), $"embedding".as("e_a"))
      val b = e.select(($"vec_id" - 1).as("vec_a"), $"vec_id".as("vec_b"), $"embedding".as("e_b"))
      a.join(b, "vec_a")
        .select($"vec_a", $"vec_b",
          round(Similarity.cosine($"e_a", $"e_b"), 4).as("cosine"))
        .orderBy($"vec_a")
    }),

    // brute-force ANN top-3 for the first 10 vectors (ranking can flip on
    // FP ties across engines → rows-only; exactness asserted in tests)
    "q_ann_topk" -> ((s, d) => {
      import s.implicits._
      Similarity.bruteForceTopK(Tables.embeddings(s, d), "vec_id", "embedding",
          queryIds = (0L until 10L), k = 3)
        .orderBy($"query_id", $"rank")
    }),

    // IVF ANN scale path: sampled-centroid cells + nProbe search; with
    // nProbe = nCells it equals brute force (asserted in tests). Full-probe
    // here so rows are deterministic; rows-only check (FP tie ranking).
    "q_ann_ivf" -> ((s, d) => {
      import s.implicits._
      Similarity.ivfTopK(Tables.embeddings(s, d), "vec_id", "embedding",
          queryIds = (0L until 10L), k = 3, nCells = 8, nProbe = 8)
        .orderBy($"query_id", $"rank")
    }),

    // multimodal: binary plumbing metadata (byte length is oracle-able;
    // the stubbed decode is exercised in tests)
    "q_multimodal_meta" -> ((s, d) => {
      import s.implicits._
      Tables.documents(s, d)
        .select($"doc_id", octet_length($"text").cast("long").as("n_bytes"),
          ascii($"text").cast("long").as("first_code"))
        .orderBy($"doc_id")
    })
  )

  val oracles: Map[String, String] = Map(
    "q_dedup_exact" ->
      """SELECT md5(text) AS h, count(*) AS n, min(doc_id) AS keep_id
        |FROM documents GROUP BY 1 ORDER BY h""".stripMargin,
    "q_fingerprint" ->
      """SELECT doc_id, md5(trim(regexp_replace(
        |  regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
        |  ' +', ' ', 'g'))) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_text_stats" ->
      """SELECT doc_id,
        | CAST(len(list_filter(string_split(text,' '), x -> x <> '')) AS BIGINT) AS n_tokens,
        | CAST(len(list_distinct(list_filter(string_split(text,' '), x -> x <> ''))) AS BIGINT) AS n_uniq,
        | CAST(length(text) - length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')) AS BIGINT) AS punct_n,
        | CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS BIGINT) AS digit_n,
        | CAST(length(text) - length(regexp_replace(text, '[A-Z]', '', 'g')) AS BIGINT) AS upper_n
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_near_dup_pairs" ->
      """WITH t AS (SELECT doc_id, list_filter(string_split(text,' '), x -> x <> '') toks FROM documents),
        |sets AS (SELECT doc_id, list_distinct(list_transform(range(1, len(toks)),
        |  i -> toks[i] || ' ' || toks[i+1])) ws FROM t),
        |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  len(list_intersect(a.ws, b.ws)) i, len(a.ws) na, len(b.ws) nb
        | FROM sets a JOIN sets b ON a.doc_id < b.doc_id)
        |SELECT doc_a, doc_b,
        | round(CAST(i AS DOUBLE)/(na+nb-i), 4) AS jaccard
        |FROM p WHERE CAST(i AS DOUBLE)/(na+nb-i) >= 0.8
        |ORDER BY doc_a, doc_b""".stripMargin,
    "q_jaccard_adjacent" ->
      """WITH t AS (SELECT doc_id, list_filter(string_split(text,' '), x -> x <> '') toks FROM documents),
        |sets AS (SELECT doc_id, list_distinct(list_transform(range(1, len(toks)),
        |  i -> toks[i] || ' ' || toks[i+1])) ws FROM t)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        | round(CAST(len(list_intersect(a.ws,b.ws)) AS DOUBLE)
        |   /(len(a.ws)+len(b.ws)-len(list_intersect(a.ws,b.ws))), 4) AS jaccard
        |FROM sets a JOIN sets b ON b.doc_id = a.doc_id + 1
        |ORDER BY doc_a""".stripMargin,
    "q_cosine_pairs" ->
      """WITH p AS (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
        |  a.embedding ea, b.embedding eb
        | FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1),
        |u AS (SELECT vec_a, vec_b, unnest(ea)::DOUBLE xa, unnest(eb)::DOUBLE xb FROM p)
        |SELECT vec_a, vec_b,
        | round(sum(xa*xb)/(sqrt(sum(xa*xa))*sqrt(sum(xb*xb))), 4) AS cosine
        |FROM u GROUP BY 1,2 ORDER BY vec_a""".stripMargin,
    "q_multimodal_meta" ->
      """SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        | CAST(ascii(text) AS BIGINT) AS first_code
        |FROM documents ORDER BY doc_id""".stripMargin
  )
}
