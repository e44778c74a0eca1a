package graft.queries

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.dataprep.{Dedup, Multimodal, Similarity, TextAnalysis}

/** Training-data pipeline operators (task brief): dedup family,
  * similarity search, text analysis, multimodal plumbing — over the
  * `documents` and `embeddings` tables. Keys without an `oracle` use
  * xxhash64/LSH internals DuckDB cannot replicate; their correctness is
  * covered by scalatest (known-duplicate fixtures) instead.
  */
object DataPrepQueries {

  /** Tokenizer CTE fragment shared by oracles (mirrors Dedup.tokens —
    * duckdb's split keeps empty strings, so filter them like Spark). */
  private val toksSql =
    """toks AS (
      |  SELECT doc_id, tok, CAST(i AS INT) AS i FROM (
      |    SELECT doc_id,
      |      unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS tok,
      |      generate_subscripts(string_split_regex(lower(text), '[^a-z0-9]+'), 1) AS i
      |    FROM documents)
      |  WHERE tok <> ''
      |)""".stripMargin

  val all: Map[String, Q] = Map(

    // ---------- dedup ----------
    "dedup_exact" -> Q(
      """SELECT md5(text) AS fp, min(doc_id) AS keep_doc_id,
        |       count(*) AS n_copies
        |FROM documents GROUP BY md5(text)""".stripMargin)(
      (s, d) => Dedup.exact(Tables.documents(s, d))),

    "dedup_minhash" -> Q.noOracle(
      (s, d) => {
        // per-doc MinHash digest; xxhash64 has no DuckDB twin → no oracle
        val sig = Dedup.minhashSignature(Tables.documents(s, d))
        sig.select(col("doc_id"),
          md5(array_join(transform(col("sig"), x => x.cast("string")), ",")
            .cast("binary")).as("minhash_digest"))
      }),

    "dedup_minhash_pairs" -> Q.noOracle(
      (s, d) => Dedup.minhashPairs(Tables.documents(s, d))),

    "dedup_simhash" -> Q.noOracle(
      (s, d) => Dedup.simhash(Tables.documents(s, d))),

    "dedup_simhash_pairs" -> Q.noOracle(
      (s, d) => Dedup.simhashPairs(Tables.documents(s, d))),

    "dedup_ngram_jaccard" -> Q(
      ("WITH " + toksSql + """,
        |base AS (
        |  SELECT doc_id FROM toks GROUP BY doc_id HAVING count(*) >= 3
        |),
        |bucket AS (
        |  SELECT t1.doc_id, t1.tok || ' ' || t2.tok AS bucket
        |  FROM (SELECT doc_id, tok, row_number() OVER (PARTITION BY doc_id ORDER BY i) rn
        |        FROM toks) t1
        |  JOIN (SELECT doc_id, tok, row_number() OVER (PARTITION BY doc_id ORDER BY i) rn
        |        FROM toks) t2
        |    ON t1.doc_id = t2.doc_id AND t1.rn = 1 AND t2.rn = 2
        |  WHERE t1.doc_id IN (SELECT doc_id FROM base)
        |),
        |seq AS (SELECT doc_id, tok,
        |        row_number() OVER (PARTITION BY doc_id ORDER BY i) AS rn FROM toks),
        |shd AS (
        |  SELECT DISTINCT a.doc_id, a.tok || ' ' || b.tok || ' ' || c.tok AS shingle
        |  FROM seq a JOIN seq b ON a.doc_id = b.doc_id AND b.rn = a.rn + 1
        |             JOIN seq c ON a.doc_id = c.doc_id AND c.rn = a.rn + 2
        |),
        |counts AS (SELECT doc_id, count(*) AS n FROM shd GROUP BY doc_id),
        |pairs AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM bucket a JOIN bucket b ON a.bucket = b.bucket AND a.doc_id < b.doc_id
        |),
        |inter AS (
        |  SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, count(*) AS i
        |  FROM shd x JOIN shd y ON x.shingle = y.shingle AND x.doc_id < y.doc_id
        |  GROUP BY x.doc_id, y.doc_id
        |)
        |SELECT p.doc_a, p.doc_b,
        |  CAST(coalesce(i.i, 0) AS DOUBLE) /
        |  CAST(ca.n + cb.n - coalesce(i.i, 0) AS DOUBLE) AS jaccard
        |FROM pairs p
        |LEFT JOIN inter i ON p.doc_a = i.doc_a AND p.doc_b = i.doc_b
        |JOIN counts ca ON p.doc_a = ca.doc_id
        |JOIN counts cb ON p.doc_b = cb.doc_id""").stripMargin)(
      (s, d) => Dedup.ngramJaccardPairs(Tables.documents(s, d))),

    "dedup_embedding" -> Q(
      """SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
        |  round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
        |                               CAST(b.embedding AS DOUBLE[])), 4) AS cos_sim
        |FROM embeddings a JOIN embeddings b
        |  ON a.label = b.label AND a.vec_id < b.vec_id
        |WHERE round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
        |                                   CAST(b.embedding AS DOUBLE[])), 4) >= 0.2""".stripMargin)(
      (s, d) => Dedup.embeddingPairs(Tables.embeddings(s, d))),

    // ---------- similarity search ----------
    "ann_bruteforce" -> Q(
      """SELECT a.vec_id,
        |  round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
        |                               CAST(q.embedding AS DOUBLE[])), 4) AS cos_sim
        |FROM embeddings a, (SELECT embedding FROM embeddings WHERE vec_id = 0) q
        |WHERE a.vec_id <> 0
        |ORDER BY cos_sim DESC, a.vec_id LIMIT 10""".stripMargin)(
      (s, d) => Similarity.bruteForceTopK(Tables.embeddings(s, d))),

    "ann_lsh" -> Q.noOracle(
      (s, d) => Similarity.lshTopK(Tables.embeddings(s, d), dim = 64)),

    // ---------- text analysis ----------
    "text_langid" -> Q(
      ("WITH " + toksSql + """,
        |markers(cand_lang, marker) AS (VALUES
        |  ('en','the'),('en','a'),('en','of'),('en','and'),('en','to'),
        |  ('es','el'),('es','la'),('es','de'),('es','que'),('es','y'),
        |  ('de','der'),('de','die'),('de','das'),('de','und'),('de','ist')),
        |scores AS (
        |  SELECT t.doc_id, m.cand_lang, count(*) AS n_markers
        |  FROM toks t JOIN markers m ON t.tok = m.marker
        |  GROUP BY t.doc_id, m.cand_lang
        |),
        |best AS (
        |  SELECT doc_id, cand_lang, n_markers FROM (
        |    SELECT *, row_number() OVER (PARTITION BY doc_id
        |      ORDER BY n_markers DESC, cand_lang) AS rn FROM scores)
        |  WHERE rn = 1
        |)
        |SELECT d.doc_id,
        |  coalesce(b.cand_lang, 'unknown') AS predicted_lang,
        |  coalesce(b.n_markers, 0) AS n_markers
        |FROM documents d LEFT JOIN best b ON d.doc_id = b.doc_id""").stripMargin)(
      (s, d) => TextAnalysis.langId(Tables.documents(s, d))),

    "text_quality" -> Q(
      ("WITH " + toksSql + """,
        |agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens FROM toks GROUP BY doc_id)
        |SELECT d.doc_id, d.n_chars, a.n_tokens,
        |  CAST(length(regexp_replace(lower(d.text), '[^a-z0-9]', '', 'g')) AS DOUBLE)
        |    / CAST(a.n_tokens AS DOUBLE) AS avg_token_len,
        |  CAST((SELECT count(*) FROM toks t WHERE t.doc_id = d.doc_id
        |        AND t.tok IN ('the','a','of','and','to')) AS DOUBLE)
        |    / CAST(a.n_tokens AS DOUBLE) AS stopword_ratio,
        |  CAST(length(d.text)
        |    - length(regexp_replace(lower(d.text), '[^a-z0-9]', '', 'g'))
        |    - (length(d.text) - length(replace(d.text, ' ', ''))) AS BIGINT) AS n_punct
        |FROM documents d JOIN agg a ON d.doc_id = a.doc_id""").stripMargin)(
      (s, d) => TextAnalysis.quality(Tables.documents(s, d))),

    "text_tokens" -> Q(
      """SELECT doc_id,
        |  CAST(len(list_filter(string_split(text, ' '), t -> t <> '')) AS BIGINT) AS n_ws_tokens,
        |  CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS n_bpe_tokens
        |FROM documents""".stripMargin)(
      (s, d) => TextAnalysis.tokenCounts(Tables.documents(s, d))),

    "text_fingerprint" -> Q(
      """SELECT doc_id,
        |  md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS fingerprint
        |FROM documents""".stripMargin)(
      (s, d) => TextAnalysis.fingerprint(Tables.documents(s, d))),

    // ---------- multimodal ----------
    "mm_metadata" -> Q(
      """SELECT doc_id,
        |  CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
        |       ELSE 'video' END AS media_kind,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  md5(text) AS content_hash,
        |  CAST(64 + octet_length(encode(text)) % 512 AS INT) AS fake_width,
        |  CAST(64 + (octet_length(encode(text)) * 7) % 512 AS INT) AS fake_height,
        |  CAST(1 + doc_id % 24 AS INT) AS fake_frames
        |FROM documents""".stripMargin)(
      (s, d) => Multimodal.metadata(Tables.documents(s, d)))
  )
}
