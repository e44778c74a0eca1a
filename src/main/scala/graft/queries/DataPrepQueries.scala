package graft.queries

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.dataprep.{Dedup, Multimodal, Similarity, TextAnalysis}

/** Training-data pipeline operators (task brief): dedup family,
  * similarity search, text analysis, multimodal plumbing — over the
  * `documents` and `embeddings` tables.
  *
  * Every key has a full DuckDB oracle (VERDICT r1 #6): the dedup/ANN
  * hashing is md5 + pure 64-bit integer arithmetic (see
  * [[graft.dataprep.Dedup]] / [[graft.functions.VecOps.lshBucketF]]),
  * which both engines compute bit-identically — signatures, bands,
  * buckets and candidate pairs are replicated in SQL below, not merely
  * spot-checked in scalatest.
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

  /** 3-token shingles + the two md5-slice base hashes (mirrors
    * Dedup.shingleRows / Dedup.withBaseHashes: h1 = hex[1..8],
    * h2 = hex[9..16] of ONE md5 per distinct shingle). Needs `toks`. */
  private val shingleHashSql =
    """seq AS (SELECT doc_id, tok,
      |        row_number() OVER (PARTITION BY doc_id ORDER BY i) AS rn FROM toks),
      |shd AS (
      |  SELECT DISTINCT a.doc_id, a.tok || ' ' || b.tok || ' ' || c.tok AS shingle
      |  FROM seq a JOIN seq b ON a.doc_id = b.doc_id AND b.rn = a.rn + 1
      |             JOIN seq c ON a.doc_id = c.doc_id AND c.rn = a.rn + 2
      |),
      |hs AS (
      |  SELECT doc_id, shingle,
      |    ('0x' || substring(md5(shingle), 1, 8))::BIGINT AS h1,
      |    ('0x' || substring(md5(shingle), 9, 8))::BIGINT AS h2
      |  FROM shd
      |)""".stripMargin

  /** The Manku multi-table blocking tables as SQL VALUES literals —
    * generated from [[graft.dataprep.Dedup.SimhashTables]] so the
    * oracle's blocking geometry cannot drift from the engine's. */
  private val simhashCombosValues: String =
    Dedup.SimhashTables.map { case (t, blocks) =>
      s"($t, ${blocks.mkString(", ")})"
    }.mkString(",\n  ")

  /** Kirsch–Mitzenmacher permutation minima, one row per (doc_id, i):
    * g_i = (h1 + i*h2) mod 4294967291 (mirrors Dedup.perm). */
  private def sigSql(nPerms: Int): String =
    s"""sig AS (
       |  SELECT doc_id, i, min((h1 + i * h2) % 4294967291) AS mh
       |  FROM hs CROSS JOIN generate_series(0, ${nPerms - 1}) t(i)
       |  GROUP BY doc_id, i
       |)""".stripMargin

  /** The full minhash-LSH pair pipeline as one reusable CTE list
    * ending in `pairs(doc_a, doc_b)` — shared by the pair, cluster,
    * and survivor oracles so the banding geometry and threshold
    * cannot drift between them (mirrors [[Dedup.minhashPairs]]). */
  private val minhashPairsCtes: String =
    (toksSql + ",\n" + shingleHashSql + ",\n" + sigSql(Dedup.NumPerms) + s""",
      |bands AS (
      |  SELECT doc_id, CAST(i // ${Dedup.RowsPerBand} AS INT) AS band_idx,
      |         md5(string_agg(mh::VARCHAR, ',' ORDER BY i)) AS band_key
      |  FROM sig GROUP BY doc_id, i // ${Dedup.RowsPerBand}
      |),
      |cand AS (
      |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      |  FROM bands a JOIN bands b ON a.band_idx = b.band_idx
      |    AND a.band_key = b.band_key AND a.doc_id < b.doc_id
      |),
      |est AS (
      |  SELECT c.doc_a, c.doc_b,
      |    CAST(sum(CASE WHEN sa.mh = sb.mh THEN 1 ELSE 0 END) AS DOUBLE)
      |      / ${Dedup.NumPerms}.0 AS est_sim
      |  FROM cand c
      |  JOIN sig sa ON sa.doc_id = c.doc_a
      |  JOIN sig sb ON sb.doc_id = c.doc_b AND sb.i = sa.i
      |  GROUP BY c.doc_a, c.doc_b
      |),
      |pairs AS (SELECT doc_a, doc_b FROM est WHERE est_sim >= 0.5)""").stripMargin

  /** Connected components over the minhash dup graph as a recursive
    * transitive closure (components are tiny at fixture scale — the
    * closure is the oracle's job, [[Dedup.clusters]] does the scalable
    * version): `comp(doc_id, cluster_id)` for every paired doc,
    * cluster_id = component min. Needs a `WITH RECURSIVE` prefix. */
  private val dupComponentCtes: String =
    (minhashPairsCtes + """,
      |edges AS (
      |  SELECT doc_a AS a, doc_b AS b FROM pairs
      |  UNION SELECT doc_b, doc_a FROM pairs
      |),
      |reach(a, b) AS (
      |  SELECT a, b FROM edges
      |  UNION
      |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
      |),
      |comp AS (
      |  SELECT a AS doc_id, least(a, min(b)) AS cluster_id
      |  FROM reach GROUP BY a
      |)""").stripMargin

  /** Hyperplane-LSH bucket per embedding (mirrors
    * graft.functions.VecOps: milli-unit quantization, two Lehmer
    * rounds mod 2^31-1 for the weights, exact integer plane dots). */
  private val lshBucketSql =
    """planes AS (
      |  SELECT p, i,
      |    (((((p * 131 + i + 7) * 2654435761) % 2147483647) * 48271)
      |      % 2147483647) % 1999 - 999 AS w
      |  FROM generate_series(0, 5) tp(p) CROSS JOIN generate_series(0, 255) ti(i)
      |),
      |comps AS (
      |  SELECT vec_id, CAST(i - 1 AS BIGINT) AS i,
      |         CAST(floor(CAST(e AS DOUBLE) * 1000 + 0.5) AS BIGINT) AS xq
      |  FROM (SELECT vec_id, unnest(CAST(embedding AS DOUBLE[])) AS e,
      |               generate_subscripts(embedding, 1) AS i FROM embeddings)
      |),
      |dots AS (SELECT c.vec_id, p.p, sum(c.xq * p.w) AS s
      |         FROM comps c JOIN planes p ON c.i = p.i GROUP BY c.vec_id, p.p),
      |buckets AS (
      |  SELECT vec_id,
      |    CAST(sum(CASE WHEN s >= 0 THEN (1::BIGINT << CAST(p AS INT))
      |             ELSE 0 END) AS BIGINT) AS bucket
      |  FROM dots GROUP BY vec_id
      |)""".stripMargin

  /** IVF oracle (mirrors [[graft.dataprep.Similarity.ivfTopK]] with
    * its fixture defaults: 8 cells, 2 update rounds, nprobe 1, k 5,
    * query vec_id 0): deterministic integer k-means — milli-unit
    * quantization, integer Σ(x−μ)² distances, floor-div centroids via
    * the posmod trick (identical for negative sums in both engines),
    * smallest-cell tie-break. Seeds are the `cells` SMALLEST vec_ids,
    * cell id = rank (r5: the rank form replaces `vec_id < cells`, so
    * the contract holds for any id set — ADVICE r4). The two update
    * rounds are unrolled as sequential CTEs (a data-dependent stopping
    * rule would not be oracle-stable). */
  private val ivfSql: String = {
    val cells = 8
    // one (distances, assignment) round under centroid CTE `cent`
    def round(cent: String, dName: String, aName: String): String =
      s"""$dName AS (
         |  SELECT c.vec_id, s.cell, sum((c.xq - s.mu) * (c.xq - s.mu)) AS d
         |  FROM comps c JOIN $cent s ON c.i = s.i GROUP BY c.vec_id, s.cell
         |),
         |$aName AS (
         |  SELECT vec_id, cell FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d, cell) AS rn
         |    FROM $dName)
         |  WHERE rn = 1
         |)""".stripMargin
    // centroid update from assignment `a`, empty cells keep `prev`
    def update(a: String, prev: String, sName: String, cName: String): String =
      s"""$sName AS (
         |  SELECT a.cell, c.i, sum(c.xq) AS s, count(*) AS cnt
         |  FROM comps c JOIN $a a ON c.vec_id = a.vec_id GROUP BY a.cell, c.i
         |),
         |$cName AS (
         |  SELECT cell, i, (s - (((s % cnt) + cnt) % cnt)) // cnt AS mu FROM $sName
         |  UNION ALL
         |  SELECT cell, i, mu FROM $prev
         |  WHERE cell NOT IN (SELECT DISTINCT cell FROM $sName)
         |)""".stripMargin
    s"""WITH comps AS (
       |  SELECT vec_id, CAST(i - 1 AS BIGINT) AS i,
       |         CAST(floor(CAST(e AS DOUBLE) * 1000 + 0.5) AS BIGINT) AS xq
       |  FROM (SELECT vec_id, unnest(CAST(embedding AS DOUBLE[])) AS e,
       |               generate_subscripts(embedding, 1) AS i FROM embeddings)
       |),
       |seeds AS (
       |  SELECT vec_id, CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cell
       |  FROM (SELECT DISTINCT vec_id FROM embeddings ORDER BY vec_id LIMIT $cells)
       |),
       |c0 AS (SELECT s.cell, c.i, c.xq AS mu
       |       FROM comps c JOIN seeds s ON c.vec_id = s.vec_id),
       |${round("c0", "d0", "a0")},
       |${update("a0", "c0", "s1", "c1")},
       |${round("c1", "d1", "a1")},
       |${update("a1", "c1", "s2", "c2")},
       |${round("c2", "d2", "af")}""".stripMargin
  }

  /** Single-query IVF key SQL: the shared quantizer CTEs + nprobe-1
    * top-k for query vec_id 0. */
  private val ivfTopKSql: String =
    s"""$ivfSql,
       |qc AS (SELECT cell FROM af WHERE vec_id = 0),
       |q AS (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = 0)
       |SELECT e.vec_id, CAST(a.cell AS INT) AS cell,
       |  round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
       |                               CAST(q.q_emb AS DOUBLE[])), 4) AS cos_sim
       |FROM embeddings e
       |JOIN af a ON e.vec_id = a.vec_id
       |CROSS JOIN qc CROSS JOIN q
       |WHERE a.cell = qc.cell AND e.vec_id <> 0
       |ORDER BY cos_sim DESC, e.vec_id LIMIT 5""".stripMargin

  /** The IVF candidate CTE shared by every batch key: corpus ⋈
    * inverted-list assignment ⋈ a `qs` CTE of (q_id, q_emb, probe)
    * rows, self-excluded, rounded cosine. ONE spelling of the
    * candidate-generation contract (r5 review: previously repeated
    * verbatim in three oracle strings — a future ranking/rounding
    * change applied to one copy would silently desynchronize the
    * others, the drift [[minhashPairsCtes]] exists to prevent). */
  private val ivfCandCte: String =
    """cand AS (
      |  SELECT q.q_id, e.vec_id,
      |    round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
      |                                 CAST(q.q_emb AS DOUBLE[])), 4) AS cos_sim
      |  FROM embeddings e JOIN af a ON e.vec_id = a.vec_id
      |  JOIN qs q ON a.cell = q.probe AND e.vec_id <> q.q_id
      |)""".stripMargin

  /** The per-query top-3 tail over [[ivfCandCte]] — the single
    * spelling of the (rounded-cosine desc, vec_id) tie-break the
    * Spark side's shared `rankTopK` guarantees. */
  private val ivfTop3Sql: String =
    """SELECT q_id, vec_id, cos_sim, CAST(rn AS INT) AS rn FROM (
      |  SELECT *, row_number() OVER (PARTITION BY q_id
      |    ORDER BY cos_sim DESC, vec_id) AS rn FROM cand)
      |WHERE rn <= 3""".stripMargin

  /** Batch IVF key SQL: same quantizer, query set = vec_id % 50 = 0,
    * ONE cell equi-join, per-query top-3 (mirrors
    * [[graft.dataprep.Similarity.ivfTopKBatch]]). */
  private val ivfBatchSql: String =
    s"""$ivfSql,
       |qs AS (SELECT a.vec_id AS q_id, e.embedding AS q_emb, a.cell AS probe
       |       FROM af a JOIN embeddings e ON a.vec_id = e.vec_id
       |       WHERE a.vec_id % 50 = 0),
       |$ivfCandCte
       |$ivfTop3Sql""".stripMargin

  /** Query-set probe CTEs under the FINAL centroids: the `nprobe`
    * nearest cells per query, distance-then-cell ordered — mirrors
    * [[graft.functions.IvfOps.probesF]] (d2 holds every corpus
    * vector's distances under c2; its rank-1 row is exactly `af`). */
  private def ivfProbesCte(nprobe: Int): String =
    s"""qprobe AS (
       |  SELECT vec_id AS q_id, cell AS probe FROM (
       |    SELECT vec_id, cell,
       |      row_number() OVER (PARTITION BY vec_id ORDER BY d, cell) AS rn
       |    FROM d2)
       |  WHERE rn <= $nprobe AND vec_id % 50 = 0
       |),
       |qs AS (SELECT p.q_id, e.embedding AS q_emb, p.probe
       |       FROM qprobe p JOIN embeddings e ON p.q_id = e.vec_id)""".stripMargin

  /** Multi-probe batch IVF key SQL (nprobe = 2): each query scans its
    * two nearest inverted lists — mirrors
    * [[graft.dataprep.Similarity.ivfTopKBatch]] with nprobe = 2. */
  private val ivfProbeSql: String =
    s"""$ivfSql,
       |${ivfProbesCte(2)},
       |$ivfCandCte
       |$ivfTop3Sql""".stripMargin

  /** IVF recall key SQL (mirrors
    * [[graft.dataprep.Similarity.ivfRecallAtK]]): recall@3 of the
    * nprobe-cell IVF candidates vs the exact brute-force top-3 under
    * the shared (rounded-cosine desc, vec_id) ranking contract. */
  private def ivfRecallSql(nprobe: Int): String =
    s"""$ivfSql,
       |${ivfProbesCte(nprobe)},
       |$ivfCandCte,
       |approx AS (
       |  SELECT q_id, vec_id FROM (
       |    SELECT q_id, vec_id, row_number() OVER (PARTITION BY q_id
       |      ORDER BY cos_sim DESC, vec_id) AS rn FROM cand)
       |  WHERE rn <= 3
       |),
       |qe AS (SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings
       |       WHERE vec_id % 50 = 0),
       |exact AS (
       |  SELECT q_id, vec_id FROM (
       |    SELECT q.q_id, e.vec_id, row_number() OVER (PARTITION BY q.q_id
       |      ORDER BY round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
       |                                            CAST(q.q_emb AS DOUBLE[])), 4) DESC,
       |               e.vec_id) AS rn
       |    FROM embeddings e CROSS JOIN qe q WHERE e.vec_id <> q.q_id)
       |  WHERE rn <= 3
       |)
       |SELECT x.q_id, CAST(count(*) AS BIGINT) AS n_exact,
       |  CAST(sum(CASE WHEN a.vec_id IS NULL THEN 0 ELSE 1 END) AS BIGINT) AS n_hit,
       |  CAST(sum(CASE WHEN a.vec_id IS NULL THEN 0 ELSE 1 END) AS DOUBLE)
       |    / CAST(count(*) AS DOUBLE) AS recall
       |FROM exact x LEFT JOIN approx a ON x.q_id = a.q_id AND x.vec_id = a.vec_id
       |GROUP BY x.q_id""".stripMargin

  val all: Map[String, Q] = Map(

    // ---------- dedup ----------
    "dedup_exact" -> Q(
      """SELECT md5(text) AS fp, min(doc_id) AS keep_doc_id,
        |       count(*) AS n_copies
        |FROM documents GROUP BY md5(text)""".stripMargin)(
      (s, d) => Dedup.exact(Tables.documents(s, d))),

    "dedup_minhash" -> Q(
      ("WITH " + toksSql + ",\n" + shingleHashSql + ",\n" + sigSql(Dedup.NumPerms) + """
        |SELECT doc_id,
        |  md5(string_agg(mh::VARCHAR, ',' ORDER BY i)) AS minhash_digest
        |FROM sig GROUP BY doc_id""").stripMargin)(
      (s, d) => {
        val sig = Dedup.minhashSignature(Tables.documents(s, d))
        sig.select(col("doc_id"),
          md5(array_join(transform(col("sig"), x => x.cast("string")), ",")
            .cast("binary")).as("minhash_digest"))
      }),

    "dedup_minhash_pairs" -> Q(
      ("WITH " + minhashPairsCtes + """
        |SELECT doc_a, doc_b, est_sim FROM est WHERE est_sim >= 0.5""").stripMargin)(
      (s, d) => Dedup.minhashPairs(Tables.documents(s, d))),

    // Near-dup CLUSTER resolution (the keep-one-per-content-family
    // decision a training pipeline actually ships): connected
    // components over the minhash pair graph, replayed in the oracle
    // as a recursive-CTE transitive closure over the SAME pair CTEs —
    // cluster_id = component min, bit-exact in both engines.
    "dedup_clusters" -> Q(
      ("WITH RECURSIVE " + dupComponentCtes + """
        |SELECT doc_id, cluster_id FROM comp""").stripMargin)(
      (s, d) => Dedup.clusters(Dedup.minhashPairs(Tables.documents(s, d)))),

    // The deduplicated corpus: min-doc_id survivor per cluster + every
    // unpaired doc, with the absorbed-member count for dedup-rate
    // bookkeeping. Corpus-side plan is one anti join + one left join
    // against dup-graph-sized tables.
    "dedup_survivors" -> Q(
      ("WITH RECURSIVE " + dupComponentCtes + """,
        |sizes AS (
        |  SELECT cluster_id, count(*) AS n_members FROM comp GROUP BY cluster_id
        |)
        |SELECT d.doc_id, coalesce(s.n_members, CAST(1 AS BIGINT)) AS n_members
        |FROM documents d
        |LEFT JOIN comp c ON c.doc_id = d.doc_id
        |LEFT JOIN sizes s ON s.cluster_id = d.doc_id
        |WHERE c.cluster_id IS NULL OR c.cluster_id = d.doc_id""").stripMargin)(
      (s, d) => {
        val docs = Tables.documents(s, d)
        // survivors passes every corpus column through (usable content,
        // not a re-join list); the oracle key checks the bookkeeping pair
        Dedup.survivors(docs, Dedup.minhashPairs(docs))
          .select(col("doc_id"), col("n_members"))
      }),

    "dedup_simhash" -> Q(
      ("WITH " + toksSql + s""",
        |th AS (SELECT doc_id,
        |       ('0x' || substring(md5(tok), 1, 15))::BIGINT AS h FROM toks),
        |bits AS (
        |  SELECT doc_id, b,
        |    sum(CASE WHEN (h >> CAST(b AS INT)) & 1 = 1 THEN 1 ELSE -1 END) AS s
        |  FROM th CROSS JOIN generate_series(0, ${Dedup.SimhashBits - 1}) t(b)
        |  GROUP BY doc_id, b
        |)
        |SELECT doc_id,
        |  CAST(sum(CASE WHEN s > 0 THEN (1::BIGINT << CAST(b AS INT))
        |           ELSE 0 END) AS BIGINT) AS simhash
        |FROM bits GROUP BY doc_id""").stripMargin)(
      (s, d) => Dedup.simhash(Tables.documents(s, d))),

    "dedup_simhash_pairs" -> Q(
      ("WITH " + toksSql + s""",
        |th AS (SELECT doc_id,
        |       ('0x' || substring(md5(tok), 1, 15))::BIGINT AS h FROM toks),
        |bits AS (
        |  SELECT doc_id, b,
        |    sum(CASE WHEN (h >> CAST(b AS INT)) & 1 = 1 THEN 1 ELSE -1 END) AS s
        |  FROM th CROSS JOIN generate_series(0, ${Dedup.SimhashBits - 1}) t(b)
        |  GROUP BY doc_id, b
        |),
        |sh AS (
        |  SELECT doc_id,
        |    CAST(sum(CASE WHEN s > 0 THEN (1::BIGINT << CAST(b AS INT))
        |             ELSE 0 END) AS BIGINT) AS simhash
        |  FROM bits GROUP BY doc_id
        |),
        |combos(t, b0, b1, b2) AS (VALUES
        |  ${simhashCombosValues}),
        |keys AS (
        |  SELECT doc_id, simhash, t,
        |    (((simhash >> CAST(b0 * ${Dedup.BlockBits} AS INT)) & ${(1L << Dedup.BlockBits) - 1L})
        |       << ${2 * Dedup.BlockBits}) |
        |    (((simhash >> CAST(b1 * ${Dedup.BlockBits} AS INT)) & ${(1L << Dedup.BlockBits) - 1L})
        |       << ${Dedup.BlockBits}) |
        |    ((simhash >> CAST(b2 * ${Dedup.BlockBits} AS INT)) & ${(1L << Dedup.BlockBits) - 1L}) AS k
        |  FROM sh CROSS JOIN combos
        |)
        |SELECT doc_a, doc_b, hamming FROM (
        |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |    CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
        |  FROM keys a JOIN keys b ON a.t = b.t AND a.k = b.k
        |    AND a.doc_id < b.doc_id)
        |WHERE hamming <= 3""").stripMargin)(
      (s, d) => Dedup.simhashPairs(Tables.documents(s, d))),

    "dedup_ngram_jaccard" -> Q(
      ("WITH " + toksSql + ",\n" + shingleHashSql + ",\n" +
        sigSql(Dedup.JaccardBands * Dedup.JaccardRows) + s""",
        |bands AS (
        |  SELECT doc_id, CAST(i // ${Dedup.JaccardRows} AS INT) AS band_idx,
        |         md5(string_agg(mh::VARCHAR, ',' ORDER BY i)) AS band_key
        |  FROM sig GROUP BY doc_id, i // ${Dedup.JaccardRows}
        |),
        |pairs AS (
        |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM bands a JOIN bands b ON a.band_idx = b.band_idx
        |    AND a.band_key = b.band_key AND a.doc_id < b.doc_id
        |),
        |counts AS (SELECT doc_id, count(*) AS n FROM shd GROUP BY doc_id),
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
      ("WITH " + lshBucketSql + """
        |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
        |  round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
        |                               CAST(b.embedding AS DOUBLE[])), 4) AS cos_sim
        |FROM embeddings a
        |JOIN buckets ba ON a.vec_id = ba.vec_id
        |JOIN buckets bb ON ba.bucket = bb.bucket
        |JOIN embeddings b ON b.vec_id = bb.vec_id AND a.vec_id < b.vec_id
        |WHERE round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
        |                                   CAST(b.embedding AS DOUBLE[])), 4) >= 0.2""").stripMargin)(
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

    "ann_lsh" -> Q(
      ("WITH " + lshBucketSql + """,
        |q AS (SELECT b.bucket AS q_bucket, e.embedding AS q_emb
        |      FROM buckets b JOIN embeddings e ON b.vec_id = e.vec_id
        |      WHERE b.vec_id = 0)
        |SELECT e.vec_id, b.bucket,
        |  round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
        |                               CAST(q.q_emb AS DOUBLE[])), 4) AS cos_sim
        |FROM embeddings e JOIN buckets b ON e.vec_id = b.vec_id CROSS JOIN q
        |WHERE e.vec_id <> 0 AND b.bucket = q.q_bucket
        |ORDER BY cos_sim DESC, e.vec_id LIMIT 5""").stripMargin)(
      (s, d) => Similarity.lshTopK(Tables.embeddings(s, d))),

    "ann_lsh_batch" -> Q(
      ("WITH " + lshBucketSql + """,
        |qs AS (SELECT e.vec_id AS q_id, e.embedding AS q_emb, b.bucket AS q_bucket
        |       FROM embeddings e JOIN buckets b ON e.vec_id = b.vec_id
        |       WHERE e.vec_id % 50 = 0),
        |cand AS (
        |  SELECT q.q_id, e.vec_id,
        |    round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
        |                                 CAST(q.q_emb AS DOUBLE[])), 4) AS cos_sim
        |  FROM embeddings e JOIN buckets b ON e.vec_id = b.vec_id
        |  JOIN qs q ON b.bucket = q.q_bucket AND e.vec_id <> q.q_id
        |)
        |SELECT q_id, vec_id, cos_sim, CAST(rn AS INT) AS rn FROM (
        |  SELECT *, row_number() OVER (PARTITION BY q_id
        |    ORDER BY cos_sim DESC, vec_id) AS rn FROM cand)
        |WHERE rn <= 3""").stripMargin)(
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        Similarity.lshTopKBatch(emb, emb.where(col("vec_id") % 50 === 0), k = 3)
      }),

    "ann_lsh_probe" -> Q(
      ("WITH " + lshBucketSql + s""",
        |qs AS (SELECT e.vec_id AS q_id, e.embedding AS q_emb, b.bucket AS q_bucket
        |       FROM embeddings e JOIN buckets b ON e.vec_id = b.vec_id
        |       WHERE e.vec_id % 50 = 0),
        |probes AS (
        |  SELECT q.q_id, q.q_emb,
        |    CASE WHEN p < 0 THEN q.q_bucket
        |         ELSE xor(q.q_bucket, (1::BIGINT << CAST(p AS INT))) END AS probe
        |  FROM qs q CROSS JOIN generate_series(-1, ${Similarity.LshPlanes - 1}) tp(p)
        |),
        |cand AS (
        |  SELECT pr.q_id, e.vec_id,
        |    round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
        |                                 CAST(pr.q_emb AS DOUBLE[])), 4) AS cos_sim
        |  FROM embeddings e JOIN buckets b ON e.vec_id = b.vec_id
        |  JOIN probes pr ON b.bucket = pr.probe AND e.vec_id <> pr.q_id
        |)
        |SELECT q_id, vec_id, cos_sim, CAST(rn AS INT) AS rn FROM (
        |  SELECT *, row_number() OVER (PARTITION BY q_id
        |    ORDER BY cos_sim DESC, vec_id) AS rn FROM cand)
        |WHERE rn <= 3""").stripMargin)(
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        Similarity.lshTopKBatchProbe(emb, emb.where(col("vec_id") % 50 === 0), k = 3)
      }),

    "ann_recall" -> Q(
      ("WITH " + lshBucketSql + s""",
        |qs AS (SELECT e.vec_id AS q_id, e.embedding AS q_emb, b.bucket AS q_bucket
        |       FROM embeddings e JOIN buckets b ON e.vec_id = b.vec_id
        |       WHERE e.vec_id % 50 = 0),
        |probes AS (
        |  SELECT q.q_id, q.q_emb,
        |    CASE WHEN p < 0 THEN q.q_bucket
        |         ELSE xor(q.q_bucket, (1::BIGINT << CAST(p AS INT))) END AS probe
        |  FROM qs q CROSS JOIN generate_series(-1, ${Similarity.LshPlanes - 1}) tp(p)
        |),
        |approx AS (
        |  SELECT q_id, vec_id FROM (
        |    SELECT pr.q_id, e.vec_id, row_number() OVER (PARTITION BY pr.q_id
        |      ORDER BY round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
        |                                            CAST(pr.q_emb AS DOUBLE[])), 4) DESC,
        |               e.vec_id) AS rn
        |    FROM embeddings e JOIN buckets b ON e.vec_id = b.vec_id
        |    JOIN probes pr ON b.bucket = pr.probe AND e.vec_id <> pr.q_id)
        |  WHERE rn <= 3
        |),
        |exact AS (
        |  SELECT q_id, vec_id FROM (
        |    SELECT q.q_id, e.vec_id, row_number() OVER (PARTITION BY q.q_id
        |      ORDER BY round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
        |                                            CAST(q.q_emb AS DOUBLE[])), 4) DESC,
        |               e.vec_id) AS rn
        |    FROM embeddings e CROSS JOIN qs q WHERE e.vec_id <> q.q_id)
        |  WHERE rn <= 3
        |)
        |SELECT x.q_id, CAST(count(*) AS BIGINT) AS n_exact,
        |  CAST(sum(CASE WHEN a.vec_id IS NULL THEN 0 ELSE 1 END) AS BIGINT) AS n_hit,
        |  CAST(sum(CASE WHEN a.vec_id IS NULL THEN 0 ELSE 1 END) AS DOUBLE)
        |    / CAST(count(*) AS DOUBLE) AS recall
        |FROM exact x LEFT JOIN approx a ON x.q_id = a.q_id AND x.vec_id = a.vec_id
        |GROUP BY x.q_id""").stripMargin)(
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        Similarity.recallAtK(emb, emb.where(col("vec_id") % 50 === 0), k = 3)
      }),

    "ann_ivf" -> Q(ivfTopKSql)(
      (s, d) => Similarity.ivfTopK(Tables.embeddings(s, d))),

    "ann_ivf_batch" -> Q(ivfBatchSql)(
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        Similarity.ivfTopKBatch(emb, emb.where(col("vec_id") % 50 === 0), k = 3)
      }),

    // nprobe = 2: each query scans its TWO nearest inverted lists —
    // where real IVF recall comes from; candidates ~2×, still one
    // inverted-list equi-join (probes explode query-side)
    "ann_ivf_probe" -> Q(ivfProbeSql)(
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        Similarity.ivfTopKBatch(emb, emb.where(col("vec_id") % 50 === 0),
          k = 3, nprobe = 2)
      }),

    // measured IVF recall@3 vs brute force at nprobe 1 and 2 — the
    // cells/nprobe trade graded on data, like ann_recall(_r2) for LSH
    "ivf_recall" -> Q(ivfRecallSql(1))(
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        Similarity.ivfRecallAtK(emb, emb.where(col("vec_id") % 50 === 0), k = 3)
      }),

    "ivf_recall_p2" -> Q(ivfRecallSql(2))(
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        Similarity.ivfRecallAtK(emb, emb.where(col("vec_id") % 50 === 0),
          k = 3, nprobe = 2)
      }),

    // Radius-2 variant: measures what the second probe ring buys. The
    // probe set is the full Hamming-≤2 ball (1 + 6 + C(6,2) = 22
    // probes/query at the fixture's 6 planes); recall should dominate
    // the radius-1 key above, candidate cost grows ~3× — tracked here
    // so the trade is graded on data, not asserted.
    "ann_recall_r2" -> Q(
      ("WITH " + lshBucketSql + s""",
        |qs AS (SELECT e.vec_id AS q_id, e.embedding AS q_emb, b.bucket AS q_bucket
        |       FROM embeddings e JOIN buckets b ON e.vec_id = b.vec_id
        |       WHERE e.vec_id % 50 = 0),
        |flips AS (
        |  SELECT 0::BIGINT AS f
        |  UNION ALL
        |  SELECT (1::BIGINT << CAST(p AS INT))
        |  FROM generate_series(0, ${Similarity.LshPlanes - 1}) tp(p)
        |  UNION ALL
        |  SELECT (1::BIGINT << CAST(p1 AS INT)) | (1::BIGINT << CAST(p2 AS INT))
        |  FROM generate_series(0, ${Similarity.LshPlanes - 1}) t1(p1)
        |  CROSS JOIN generate_series(0, ${Similarity.LshPlanes - 1}) t2(p2)
        |  WHERE p1 < p2
        |),
        |probes AS (
        |  SELECT q.q_id, q.q_emb, xor(q.q_bucket, fl.f) AS probe
        |  FROM qs q CROSS JOIN flips fl
        |),
        |approx AS (
        |  SELECT q_id, vec_id FROM (
        |    SELECT pr.q_id, e.vec_id, row_number() OVER (PARTITION BY pr.q_id
        |      ORDER BY round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
        |                                            CAST(pr.q_emb AS DOUBLE[])), 4) DESC,
        |               e.vec_id) AS rn
        |    FROM embeddings e JOIN buckets b ON e.vec_id = b.vec_id
        |    JOIN probes pr ON b.bucket = pr.probe AND e.vec_id <> pr.q_id)
        |  WHERE rn <= 3
        |),
        |exact AS (
        |  SELECT q_id, vec_id FROM (
        |    SELECT q.q_id, e.vec_id, row_number() OVER (PARTITION BY q.q_id
        |      ORDER BY round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
        |                                            CAST(q.q_emb AS DOUBLE[])), 4) DESC,
        |               e.vec_id) AS rn
        |    FROM embeddings e CROSS JOIN qs q WHERE e.vec_id <> q.q_id)
        |  WHERE rn <= 3
        |)
        |SELECT x.q_id, CAST(count(*) AS BIGINT) AS n_exact,
        |  CAST(sum(CASE WHEN a.vec_id IS NULL THEN 0 ELSE 1 END) AS BIGINT) AS n_hit,
        |  CAST(sum(CASE WHEN a.vec_id IS NULL THEN 0 ELSE 1 END) AS DOUBLE)
        |    / CAST(count(*) AS DOUBLE) AS recall
        |FROM exact x LEFT JOIN approx a ON x.q_id = a.q_id AND x.vec_id = a.vec_id
        |GROUP BY x.q_id""").stripMargin)(
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        Similarity.recallAtK(emb, emb.where(col("vec_id") % 50 === 0),
          k = 3, probeRadius = 2)
      }),

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
