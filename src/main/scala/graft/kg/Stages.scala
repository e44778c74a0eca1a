package graft.kg

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.{AcTrie, GazetteerMatchesExpr, NormalizeSurface}

/** The five KG pipeline stages (BASELINE.json north_star):
  * mention-detect → candidate-generate → link-score → canonicalize →
  * triple-emit, each as a declarative Dataset transform so Catalyst
  * owns the physical plan (SURVEY.md §3.1).
  *
  * All derivations here are deterministic and DuckDB-expressible so the
  * driver's oracle can replicate them end to end: the gazetteer is the
  * top-K frequent long tokens of the corpus, the anchor dictionary maps
  * each surface to two candidate entities with fixed priors, and the
  * alias graph is per-surface chains E2_s → E1_s (→ E0_s for
  * even-length surfaces).
  */
object Stages {

  val GazetteerSize = 30

  /** Derived gazetteer: top-K tokens (len ≥ 4) of `documents.text` by
    * (count desc, token asc); coarse_type from surface length. The
    * groupBy is a map-side-combinable hash agg; top-K is a
    * TakeOrderedAndProject — no full sort. */
  def gazetteer(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(explode(split(lower(col("text")), "[^a-z0-9]+")).as("surface"))
      .where(length(col("surface")) >= 4)
      .groupBy(col("surface")).agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("surface"))
      .limit(GazetteerSize)
      .select(col("surface"), col("freq"),
        element_at(
          array(lit("PER"), lit("LOC"), lit("ORG"), lit("MISC")),
          (length(col("surface")) % 4 + 1).cast("int")).as("coarse_type"))

  /** Anchor dictionary: every gazetteer surface maps to two candidate
    * entities with commonness priors 0.7 / 0.3 (Milne & Witten-style
    * P(entity|surface), SURVEY.md §1.3). */
  def anchorDict(spark: SparkSession, dir: String): DataFrame = {
    val g = gazetteer(spark, dir).select(col("surface"))
    val cands = spark.range(1).select(
      explode(array(
        struct(lit("E1_").as("pfx"), lit(0.7).as("prior")),
        struct(lit("E2_").as("pfx"), lit(0.3).as("prior")))).as("c"))
      .select(col("c.pfx").as("pfx"), col("c.prior").as("prior"))
    g.crossJoin(broadcast(cands))
      .select(col("surface").as("alias_norm"),
        concat(col("pfx"), col("surface")).as("entity_id"),
        col("prior"))
  }

  /** Redirect/alias edges: E2_s → E1_s for every surface; E1_s → E0_s
    * when length(s) is even (chains of depth 2 for CC to collapse). */
  def aliasEdges(spark: SparkSession, dir: String): DataFrame = {
    val g = gazetteer(spark, dir).select(col("surface"))
    val hop1 = g.select(
      concat(lit("E2_"), col("surface")).as("src"),
      concat(lit("E1_"), col("surface")).as("dst"),
      lit(1.0).as("weight"))
    val hop2 = g.where(length(col("surface")) % 2 === 0).select(
      concat(lit("E1_"), col("surface")).as("src"),
      concat(lit("E0_"), col("surface")).as("dst"),
      lit(1.0).as("weight"))
    hop1.unionByName(hop2)
  }

  /** Mention detection over text spans via the broadcast Aho–Corasick
    * expression (U1): one automaton pass per span, boundary-aware,
    * longest-match-wins. Aggregated to
    * (doc_id, span_idx, surface, coarse_type, n_occ). */
  def mentions(spark: SparkSession, dir: String): DataFrame = {
    val gaz = gazetteer(spark, dir)
      .select(col("surface"), col("coarse_type"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)))
    val trie = spark.sparkContext.broadcast(AcTrie(gaz.toSeq))
    val spans = Corpus.explodeSpans(Corpus.docs(spark, dir))
      .where(col("kind") === "text")
    spans
      .select(col("doc_id"), col("span_idx"),
        explode(GazetteerMatchesExpr(col("text"), trie)).as("m"))
      .select(col("doc_id"), col("span_idx"),
        NormalizeSurface(col("m.surface")).as("surface"),
        col("m.coarse_type").as("coarse_type"))
      .groupBy(col("doc_id"), col("span_idx"), col("surface"), col("coarse_type"))
      .agg(count(lit(1)).as("n_occ"))
  }

  /** Candidate generation: mention surfaces × anchor dictionary.
    * The dictionary side is small by construction → explicit
    * broadcast(), so the corpus side never shuffles (SURVEY.md §2.3 J1). */
  def candidates(spark: SparkSession, dir: String): DataFrame =
    mentions(spark, dir)
      .join(broadcast(anchorDict(spark, dir)),
        col("surface") === col("alias_norm"))
      .select(col("doc_id"), col("span_idx"), col("surface"),
        col("coarse_type"), col("n_occ"), col("entity_id"), col("prior"))

  /** Link scoring + per-mention argmax. Score arithmetic is exact
    * (+,* on representable doubles) so the DuckDB oracle matches
    * bit-for-bit; tie-break (score desc, entity_id asc) is total. */
  def links(spark: SparkSession, dir: String): DataFrame = {
    val scored = candidates(spark, dir).withColumn("score",
      col("prior")
        * when(col("entity_id").startsWith("E2_") &&
            col("doc_id").cast("long") % 7 === 0, lit(3.0)).otherwise(lit(1.0))
        * (lit(1.0) + col("n_occ")))
    // A4 arg-max per group: lexicographic max over (score, inverted entity)
    // via struct ordering — single hash aggregate, no window shuffle+sort.
    scored
      .groupBy(col("doc_id"), col("span_idx"), col("surface"), col("coarse_type"))
      .agg(max_by(
        struct(col("entity_id"), col("score")),
        struct(col("score"), col("entity_id"))).as("best"))
      .select(col("doc_id"), col("span_idx"), col("surface"), col("coarse_type"),
        col("best.entity_id").as("entity_id"), col("best.score").as("score"))
  }

  /** Canonicalization map from CC over the alias graph. */
  def canonicalMap(spark: SparkSession, dir: String): DataFrame =
    ConnectedComponents.alternating(
      aliasEdges(spark, dir).select(col("src"), col("dst")))

  /** Triple emit: mention triples + typing triples + media-adjacency
    * triples, canonicalized, deduplicated (SURVEY.md §3.1). */
  def triples(spark: SparkSession, dir: String): DataFrame = {
    val lk = links(spark, dir)
    val canon = broadcast(canonicalMap(spark, dir))

    val lkc = lk
      .join(canon.withColumnRenamed("entity_id", "eid"), col("entity_id") === col("eid"), "left")
      .select(col("doc_id"), col("span_idx"), col("coarse_type"),
        coalesce(col("canonical_id"), col("entity_id")).as("entity"))

    val mentionTriples = lkc.select(
      col("entity").as("subj"), lit("mentionedIn").as("pred"),
      concat(lit("doc:"), col("doc_id")).as("obj"))

    val typingTriples = lkc.select(
      col("entity").as("subj"), lit("hasType").as("pred"),
      col("coarse_type").as("obj"))

    // W2 adjacency: media span next to a linked text span → depictedIn.
    val spans = Corpus.explodeSpans(Corpus.docs(spark, dir))
    val media = spans.where(col("kind") =!= "text")
      .select(col("doc_id").as("m_doc"), col("span_idx").as("m_idx"), col("media_ref"))
    val mediaTriples = lkc
      .join(media, col("doc_id") === col("m_doc") &&
        (col("span_idx") === col("m_idx") - 1 || col("span_idx") === col("m_idx") + 1))
      .select(col("entity").as("subj"), lit("depictedIn").as("pred"),
        col("media_ref").as("obj"))

    mentionTriples.unionByName(typingTriples).unionByName(mediaTriples)
      .dropDuplicates("subj", "pred", "obj")
  }
}
