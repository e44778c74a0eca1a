package graft.kg

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{AcTrie, GazetteerMatchCountsExpr, GazetteerMatchesExpr, NormalizeSurface}

/** Fixture-agnostic KG-construction engine: the five-stage DAG over any
  * interleaved-span corpus + dictionaries (BASELINE.json north_star).
  * `Stages` binds it to the driver-testdata-derived fixtures; tests bind
  * it to seeded synthetic corpora and a naive single-threaded oracle.
  *
  * Contracts fixed here (SURVEY.md §0.4 determinism knobs, all in one
  * place so re-grounding against a real reference is a one-file change):
  *  - mention semantics: ASCII-folded token boundaries ([a-z0-9] word
  *    chars), longest-match-wins, non-overlapping, per-span counts;
  *  - link tie-break: lexicographic max of (score, entity_id);
  *  - canonical id: lexicographic min of the alias component;
  *  - triple vocabulary: mentionedIn / hasType / depictedIn (adjacent
  *    media span).
  */
object Engine {

  /** Raw mention match rows, BEFORE the per-span occurrence count: one
    * Aho–Corasick automaton pass per span via the broadcast expression
    * (U1), surfaces normalized (U2). Stateless Column transforms only —
    * this is the part a streaming source can run in append mode with
    * no watermark (graft.streaming.StreamOps.streamingMentions). */
  def mentionRows(spans: DataFrame, gazetteer: Seq[(String, String)]): DataFrame = {
    val spark = spans.sparkSession
    val trie = spark.sparkContext.broadcast(AcTrie(gazetteer))
    spans
      .where(col("kind") === "text")
      .select(col("doc_id"), col("span_idx"),
        explode(GazetteerMatchesExpr(col("text"), trie)).as("m"))
      .select(col("doc_id"), col("span_idx"),
        NormalizeSurface(col("m.surface")).as("surface"),
        col("m.coarse_type").as("coarse_type"))
  }

  /** Mention detection over text spans: match rows + per-span
    * occurrence counts. Returns
    * (doc_id, span_idx, surface, coarse_type, n_occ).
    *
    * ZERO shuffles (round 3): the per-span n_occ aggregate's groups
    * each live inside ONE exploded span row, so the Aho–Corasick
    * expression counts them in-register
    * ([[graft.functions.GazetteerMatchCountsExpr]], surfaces emitted
    * pre-normalized) and the former corpus-wide groupBy — the only
    * exchange between the parquet scan and the mention snapshot —
    * vanishes. Differentially guarded against the occurrence-stream
    * formulation in GoldenPipelineSpec. */
  def mentions(spans: DataFrame, gazetteer: Seq[(String, String)]): DataFrame = {
    val spark = spans.sparkSession
    val trie = spark.sparkContext.broadcast(AcTrie(gazetteer))
    spans
      .where(col("kind") === "text")
      .select(col("doc_id"), col("span_idx"),
        explode(GazetteerMatchCountsExpr(col("text"), trie)).as("m"))
      .select(col("doc_id"), col("span_idx"),
        col("m.surface").as("surface"),
        col("m.coarse_type").as("coarse_type"),
        col("m.n_occ").as("n_occ"))
  }

  /** Media-adjacency rows (doc_id, span_idx, media_ref) — the
    * depictedIn input of [[triples]]. In the materializing pipeline
    * these rows come out of the mention-stage single scan
    * ([[scanRecords]]); this derivation exists for the declarative
    * query form where nothing is materialized. */
  def mediaRows(spans: DataFrame): DataFrame =
    spans.where(col("kind") =!= "text")
      .select(col("doc_id"), col("span_idx"), col("media_ref"))

  /** Unified scan records WITH counts — the pipeline's stage-1 frame:
    * (doc_id, span_idx, rec, surface, coarse_type, media_ref, n_occ).
    * Mention rows carry in-expression per-span counts exactly as
    * [[mentions]] emits them; media rows are unique per span
    * (n_occ = 1). Entirely stateless scan-side projection — no
    * shuffle at ANY corpus size, and therefore also runnable
    * directly on a readStream in append mode. */
  def scanRecords(spans: DataFrame, gazetteer: Seq[(String, String)]): DataFrame = {
    val spark = spans.sparkSession
    val trie = spark.sparkContext.broadcast(AcTrie(gazetteer))
    val strNull = lit(null).cast("string")
    spans
      // malformed spans (null kind) carry no record: [[mentions]] and
      // [[mediaRows]] both drop them via their kind predicates, and the
      // `otherwise` branch below would otherwise misroute them to media
      // — keep the two DAG forms byte-identical on dirty corpora
      .where(col("kind").isNotNull)
      .select(col("doc_id"), col("span_idx"),
        explode(
          when(col("kind") === "text",
            transform(GazetteerMatchCountsExpr(col("text"), trie), m =>
              struct(lit("mention").as("rec"),
                m.getField("surface").as("surface"),
                m.getField("coarse_type").as("coarse_type"),
                strNull.as("media_ref"),
                m.getField("n_occ").as("n_occ"))))
          .otherwise(array(struct(lit("media").as("rec"),
            strNull.as("surface"), strNull.as("coarse_type"),
            col("media_ref").as("media_ref"),
            lit(1L).as("n_occ"))))).as("r"))
      .select(col("doc_id"), col("span_idx"), col("r.rec").as("rec"),
        col("r.surface").as("surface"), col("r.coarse_type").as("coarse_type"),
        col("r.media_ref").as("media_ref"), col("r.n_occ").as("n_occ"))
  }

  /** Candidate generation: broadcast join against the anchor dictionary
    * (alias_norm, entity_id, prior). */
  def candidates(mentions: DataFrame, anchorDict: DataFrame): DataFrame =
    mentions
      .join(broadcast(anchorDict), col("surface") === col("alias_norm"))
      .select(col("doc_id"), col("span_idx"), col("surface"),
        col("coarse_type"), col("n_occ"), col("entity_id"), col("prior"))

  /** Link scoring + per-mention argmax. `boost` is the context-score
    * hook (a Column over the candidate row). Tie-break: lexicographic
    * max of (score, entity_id) — total, deterministic. */
  def links(candidates: DataFrame, boost: Column): DataFrame =
    candidates
      .withColumn("score", col("prior") * boost * (lit(1.0) + col("n_occ")))
      .groupBy(col("doc_id"), col("span_idx"), col("surface"), col("coarse_type"))
      .agg(max_by(
        struct(col("entity_id"), col("score")),
        struct(col("score"), col("entity_id"))).as("best"))
      .select(col("doc_id"), col("span_idx"), col("surface"), col("coarse_type"),
        col("best.entity_id").as("entity_id"), col("best.score").as("score"))

  /** Entity canonicalization: CC over the alias graph (src, dst). */
  def canonical(aliasEdges: DataFrame): DataFrame =
    ConnectedComponents.alternating(aliasEdges.select(col("src"), col("dst")))

  /** Broadcast ceiling for the canonical map: ~10M (id, id) string pairs
    * ≈ low hundreds of MB — safely collectable on a production driver.
    * Above it (real Wikipedia is 10^7–10^8 entities and the 10^12-doc
    * design point implies more) an unconditional broadcast would OOM
    * the driver, so the join falls back to a shuffle. */
  val BroadcastCanonMaxRows: Long = 10000000L

  /** Triple emit: mention + typing + media-adjacency triples,
    * canonicalized and deduplicated.
    *
    * `canonRows` size-gates the canonical-map join: when the caller
    * knows the row count (snapshot manifests carry it; fixture
    * dictionaries are bounded by construction) and it is under
    * [[BroadcastCanonMaxRows]], the join is broadcast-hinted; when it
    * is known-large or unknown, no hint is applied and Catalyst/AQE
    * pick from actual stats — a corpus-scale canon map then shuffles
    * instead of OOMing the driver. */
  def triples(links: DataFrame, canon: DataFrame, mediaAdj: DataFrame,
              canonRows: Option[Long] = None): DataFrame = {
    val canonSide = canon.withColumnRenamed("entity_id", "eid")
    val canonHinted =
      if (canonRows.exists(_ <= BroadcastCanonMaxRows)) broadcast(canonSide)
      else canonSide
    val lkc = links
      .join(canonHinted, col("entity_id") === col("eid"), "left")
      .select(col("doc_id"), col("span_idx"), col("coarse_type"),
        coalesce(col("canonical_id"), col("entity_id")).as("entity"))

    // ONE pass over the links subtree: a union of three per-type
    // selects would plan the (corpus-grade) links subtree three times
    // — instead, left-join the media adjacency once and explode an
    // array of the three triple shapes per row. Rows duplicated by
    // multiple adjacent media spans are absorbed by the final dedup
    // (set semantics), exactly as the union form was. `mediaAdj` is
    // (doc_id, span_idx, media_ref) — from [[mediaRows]] in the query
    // form, or read back from the mention-stage snapshot in the
    // materializing pipeline so the corpus is not re-scanned.
    val media = mediaAdj
      .select(col("doc_id").as("m_doc"), col("span_idx").as("m_idx"), col("media_ref"))
    lkc
      .join(media, col("doc_id") === col("m_doc") &&
        (col("span_idx") === col("m_idx") - 1 || col("span_idx") === col("m_idx") + 1),
        "left")
      .select(explode(filter(array(
        struct(col("entity").as("subj"), lit("mentionedIn").as("pred"),
          concat(lit("doc:"), col("doc_id")).as("obj")),
        struct(col("entity").as("subj"), lit("hasType").as("pred"),
          col("coarse_type").as("obj")),
        when(col("media_ref").isNotNull,
          struct(col("entity").as("subj"), lit("depictedIn").as("pred"),
            col("media_ref").as("obj")))),
        x => x.isNotNull)).as("t"))
      .select(col("t.subj").as("subj"), col("t.pred").as("pred"), col("t.obj").as("obj"))
      .dropDuplicates("subj", "pred", "obj")
  }

  /** Full DAG: docs → triples. */
  def run(docs: DataFrame, gazetteer: Seq[(String, String)],
          anchorDict: DataFrame, aliasEdges: DataFrame,
          boost: Column): DataFrame = {
    val spans = Corpus.explodeSpans(docs)
    val m = mentions(spans, gazetteer)
    val c = candidates(m, anchorDict)
    val l = links(c, boost)
    triples(l, canonical(aliasEdges), mediaRows(spans))
  }
}
