package graft.queries

import org.apache.spark.sql.functions._

import graft.functions.PrAggregator
import graft.core.Tables
import graft.kg.{Corpus, Stages}

/** The KG pipeline stages as harness-visible operators. Every stage has
  * a DuckDB oracle that recomputes it from first principles over the
  * same parquet (SURVEY.md §2, §3.2) — mention detection included: the
  * Aho–Corasick expression's boundary semantics are provably equivalent
  * to the oracle's `[^a-z0-9]+` tokenizer for single-token surfaces
  * (graft.functions.AcTrie.isWordChar).
  */
object KgQueries {

  /** Interleaved-corpus CTE: mirrors graft.kg.Corpus.docs flattened. */
  private val spansSql: String =
    """spans AS (
      |  SELECT CAST(doc_id AS VARCHAR) AS doc_id, 0 AS span_idx,
      |         'text' AS kind, text, '' AS media_ref FROM documents
      |  UNION ALL
      |  SELECT CAST(doc_id AS VARCHAR), 1, 'image', 'figure ' || lang,
      |         'media://img/' || doc_id FROM documents WHERE doc_id % 3 = 0
      |  UNION ALL
      |  SELECT CAST(doc_id AS VARCHAR),
      |         CASE WHEN doc_id % 3 = 0 THEN 2 ELSE 1 END,
      |         'text', 'appendix ' || source, '' FROM documents WHERE doc_id % 5 = 0
      |)""".stripMargin

  /** Gazetteer CTE: mirrors graft.kg.Stages.gazetteer. */
  private val gazSql: String =
    """gaz AS (
      |  SELECT surface, freq,
      |    CASE length(surface) % 4 WHEN 0 THEN 'PER' WHEN 1 THEN 'LOC'
      |         WHEN 2 THEN 'ORG' ELSE 'MISC' END AS coarse_type
      |  FROM (
      |    SELECT tok AS surface, count(*) AS freq FROM (
      |      SELECT unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS tok
      |      FROM documents) t
      |    WHERE length(tok) >= 4 GROUP BY tok)
      |  ORDER BY freq DESC, surface LIMIT 30
      |)""".stripMargin

  private val mentionsSql: String =
    """toks AS (
      |  SELECT doc_id, span_idx,
      |         unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS tok
      |  FROM spans WHERE kind = 'text'
      |),
      |mentions AS (
      |  SELECT t.doc_id, t.span_idx, g.surface, g.coarse_type,
      |         count(*) AS n_occ
      |  FROM toks t JOIN gaz g ON t.tok = g.surface
      |  GROUP BY t.doc_id, t.span_idx, g.surface, g.coarse_type
      |)""".stripMargin

  private val anchorSql: String =
    """anchor AS (
      |  SELECT surface AS alias_norm, 'E1_' || surface AS entity_id,
      |         CAST(0.7 AS DOUBLE) AS prior FROM gaz
      |  UNION ALL
      |  SELECT surface, 'E2_' || surface, CAST(0.3 AS DOUBLE) FROM gaz
      |)""".stripMargin

  private val linksSql: String =
    """scored AS (
      |  SELECT m.doc_id, m.span_idx, m.surface, m.coarse_type, m.n_occ,
      |         a.entity_id,
      |         a.prior
      |           * CASE WHEN left(a.entity_id, 3) = 'E2_'
      |                   AND CAST(m.doc_id AS BIGINT) % 7 = 0
      |                  THEN CAST(3.0 AS DOUBLE) ELSE CAST(1.0 AS DOUBLE) END
      |           * (CAST(1.0 AS DOUBLE) + m.n_occ) AS score
      |  FROM mentions m JOIN anchor a ON m.surface = a.alias_norm
      |),
      |links AS (
      |  SELECT doc_id, span_idx, surface, coarse_type, entity_id, score FROM (
      |    SELECT *, row_number() OVER (
      |      PARTITION BY doc_id, span_idx, surface
      |      ORDER BY score DESC, entity_id DESC) AS rn
      |    FROM scored) WHERE rn = 1
      |)""".stripMargin

  private val edgesSql: String =
    """edges AS (
      |  SELECT 'E2_' || surface AS src, 'E1_' || surface AS dst FROM gaz
      |  UNION ALL
      |  SELECT 'E1_' || surface, 'E0_' || surface FROM gaz
      |  WHERE length(surface) % 2 = 0
      |)""".stripMargin

  /** Downward-reachability min over the (acyclic, lexicographically
    * descending) alias chains ≡ component min — the generic undirected
    * CC the engine runs is differentially tested on arbitrary graphs in
    * scalatest; this SQL form is what DuckDB can express. */
  private val canonSql: String =
    """nodes AS (SELECT src AS n FROM edges UNION SELECT dst FROM edges),
      |reach AS (
      |  SELECT n, n AS m FROM nodes
      |  UNION
      |  SELECT r.n, e.dst FROM reach r JOIN edges e ON e.src = r.m
      |),
      |canon AS (
      |  SELECT n AS entity_id, min(m) AS canonical_id FROM reach GROUP BY n
      |)""".stripMargin

  /** lkc (links with canonical ids) + media CTEs, shared by the triple
    * emit and (via [[tripleChain]]) the graph-analytics oracles. */
  private val lkcMediaSql: String =
    """lkc AS (
      |  SELECT l.doc_id, l.span_idx, l.coarse_type,
      |         coalesce(c.canonical_id, l.entity_id) AS entity
      |  FROM links l LEFT JOIN canon c ON l.entity_id = c.entity_id
      |),
      |media AS (
      |  SELECT doc_id AS m_doc, span_idx AS m_idx, media_ref
      |  FROM spans WHERE kind <> 'text'
      |)""".stripMargin

  /** The emitted triple table as a CTE — the oracle mirror of
    * graft.kg.Engine.triples' output contract. */
  private val triplesCteSql: String =
    """triples AS (
      |  SELECT DISTINCT * FROM (
      |    SELECT entity AS subj, 'mentionedIn' AS pred, 'doc:' || doc_id AS obj FROM lkc
      |    UNION ALL
      |    SELECT entity, 'hasType', coarse_type FROM lkc
      |    UNION ALL
      |    SELECT l.entity, 'depictedIn', m.media_ref
      |    FROM lkc l JOIN media m ON l.doc_id = m.m_doc
      |     AND (l.span_idx = m.m_idx - 1 OR l.span_idx = m.m_idx + 1))
      |)""".stripMargin

  private def withRec(ctes: String*)(body: String): String =
    "WITH RECURSIVE " + ctes.mkString(",\n") + "\n" + body

  /** Full pipeline-to-triples CTE chain plus caller CTEs: the shared
    * oracle prefix for every query over the CONSTRUCTED graph
    * (graft.queries.GraphQueries). */
  private[queries] def tripleChain(extra: String*)(body: String): String =
    withRec(Seq(spansSql, gazSql, mentionsSql, anchorSql, linksSql,
      edgesSql, canonSql, lkcMediaSql, triplesCteSql) ++ extra: _*)(body)

  val all: Map[String, Q] = Map(

    "explode_spans" -> Q(
      withRec(spansSql)(
        """SELECT doc_id, span_idx, kind, text, media_ref, span_idx AS offset
          |FROM spans""".stripMargin))(
      (s, d) => Corpus.explodeSpans(Corpus.docs(s, d))),

    "regroup_spans" -> Q(
      withRec(spansSql)(
        """SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
          |  string_agg(kind, '|' ORDER BY span_idx) AS kinds,
          |  string_agg(media_ref, '|' ORDER BY span_idx) AS refs
          |FROM spans GROUP BY doc_id""".stripMargin))(
      (s, d) => {
        // P3 ∘ P4 round trip, then scalar witnesses of the recovered
        // order (the full per-row invariant is property-tested).
        val re = Corpus.regroupSpans(Corpus.explodeSpans(Corpus.docs(s, d)))
        re.select(col("doc_id"),
          size(col("spans")).cast("long").as("n_spans"),
          array_join(transform(col("spans"), x => x.getField("kind")), "|").as("kinds"),
          array_join(transform(col("spans"), x => x.getField("media_ref")), "|").as("refs"))
      }),

    "regex_extract" -> Q(
      """SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, '[a-z]{6,}')) AS BIGINT) AS n_long,
        |  coalesce(regexp_extract_all(text, '[a-z]{6,}')[1], '') AS first_long
        |FROM documents""".stripMargin)(
      (s, d) => Tables.documents(s, d).select(
        col("doc_id"),
        size(regexp_extract_all(col("text"), lit("[a-z]{6,}"), lit(0))).cast("long").as("n_long"),
        coalesce(try_element_at(regexp_extract_all(col("text"), lit("[a-z]{6,}"), lit(0)), lit(1)),
          lit("")).as("first_long"))),

    "kg_gazetteer" -> Q(
      withRec(gazSql)("SELECT surface, freq, coarse_type FROM gaz"))(
      (s, d) => Stages.gazetteer(s, d)),

    "kg_mentions" -> Q(
      withRec(spansSql, gazSql, mentionsSql)(
        "SELECT doc_id, span_idx, surface, coarse_type, n_occ FROM mentions"))(
      (s, d) => Stages.mentions(s, d)),

    "kg_candidates" -> Q(
      withRec(spansSql, gazSql, mentionsSql, anchorSql)(
        """SELECT m.doc_id, m.span_idx, m.surface, m.coarse_type, m.n_occ,
          |       a.entity_id, a.prior
          |FROM mentions m JOIN anchor a ON m.surface = a.alias_norm""".stripMargin))(
      (s, d) => Stages.candidates(s, d)),

    "kg_links" -> Q(
      withRec(spansSql, gazSql, mentionsSql, anchorSql, linksSql)(
        "SELECT doc_id, span_idx, surface, coarse_type, entity_id, score FROM links"))(
      (s, d) => Stages.links(s, d)),

    "kg_canonical" -> Q(
      withRec(gazSql, edgesSql, canonSql)(
        "SELECT entity_id, canonical_id FROM canon"))(
      (s, d) => Stages.canonicalMap(s, d)),

    "join_self" -> Q(
      withRec(gazSql, edgesSql)(
        """SELECT a.src AS src, a.dst AS mid, b.dst AS dst
          |FROM edges a JOIN edges b ON a.dst = b.src""".stripMargin))(
      (s, d) => {
        // J6 graph-step self-join over the alias edges.
        val e = Stages.aliasEdges(s, d)
        e.as("a").join(e.as("b"), col("a.dst") === col("b.src"))
          .select(col("a.src").as("src"), col("a.dst").as("mid"), col("b.dst").as("dst"))
      }),

    "kg_triples" -> Q(
      tripleChain()("SELECT subj, pred, obj FROM triples"))(
      (s, d) => Stages.triples(s, d)),

    "agg_custom_pr" -> Q(
      """SELECT CAST(sum(CASE WHEN p AND a THEN 1 ELSE 0 END) AS BIGINT) AS tp,
        |  CAST(sum(CASE WHEN p AND NOT a THEN 1 ELSE 0 END) AS BIGINT) AS fp,
        |  CAST(sum(CASE WHEN NOT p AND a THEN 1 ELSE 0 END) AS BIGINT) AS fn,
        |  CAST(sum(CASE WHEN NOT p AND NOT a THEN 1 ELSE 0 END) AS BIGINT) AS tn
        |FROM (SELECT l_quantity > 25 AS p, l_discount > 0.05 AS a FROM lineitem)""".stripMargin)(
      (s, d) => {
        // A7/U5: typed Aggregator[IN,BUF,OUT] — single-pass confusion
        // matrix with map-side partial merge.
        import s.implicits._
        val pairs = Tables.lineitem(s, d)
          .select((col("l_quantity") > 25).as("_1"), (col("l_discount") > 0.05).as("_2"))
          .as[(Boolean, Boolean)]
        pairs.select(PrAggregator.toColumn).toDF()
          .select(col("tp"), col("fp"), col("fn"), col("tn"))
      })
  )
}
