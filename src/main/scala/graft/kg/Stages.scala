package graft.kg

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** The KG pipeline bound to the driver-testdata-derived fixtures
  * (BASELINE.json north_star stages; generic engine in
  * [[graft.kg.Engine]]). All derivations are deterministic and
  * DuckDB-expressible so the driver's oracle can replicate them end to
  * end: the gazetteer is the top-K frequent long tokens of the corpus,
  * the anchor dictionary maps each surface to two candidate entities
  * with fixed priors, and the alias graph is per-surface chains
  * E2_s → E1_s (→ E0_s for even-length surfaces).
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

  private def gazetteerSeq(spark: SparkSession, dir: String): Seq[(String, String)] =
    gazetteer(spark, dir)
      .select(col("surface"), col("coarse_type"))
      .collect()
      .toSeq
      .map(r => (r.getString(0), r.getString(1)))

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

  /** Context boost used by the link-score stage on this fixture. */
  def scoreBoost: Column =
    when(col("entity_id").startsWith("E2_") &&
      col("doc_id").cast("long") % 7 === 0, lit(3.0)).otherwise(lit(1.0))

  def spans(spark: SparkSession, dir: String): DataFrame =
    Corpus.explodeSpans(Corpus.docs(spark, dir))

  def mentions(spark: SparkSession, dir: String): DataFrame =
    Engine.mentions(spans(spark, dir), gazetteerSeq(spark, dir))

  def candidates(spark: SparkSession, dir: String): DataFrame =
    Engine.candidates(mentions(spark, dir), anchorDict(spark, dir))

  def links(spark: SparkSession, dir: String): DataFrame =
    Engine.links(candidates(spark, dir), scoreBoost)

  def canonicalMap(spark: SparkSession, dir: String): DataFrame =
    Engine.canonical(aliasEdges(spark, dir))

  def triples(spark: SparkSession, dir: String): DataFrame = {
    // Single-scan declarative form: media adjacency rides the mention
    // rows (explodeSpansAdj + carry), so the corpus subtree appears
    // ONCE in this plan — no separate media branch, no media join.
    val carry = Seq(Engine.AdjMedia)
    val spansAdj = Corpus.explodeSpansAdj(Corpus.docs(spark, dir))
    val l = Engine.links(
      Engine.candidates(
        Engine.mentions(spansAdj, gazetteerSeq(spark, dir), carry),
        anchorDict(spark, dir), carry),
      scoreBoost, carry)
    // canon size is bounded by construction: ≤3 entity nodes (E0/E1/E2)
    // per gazetteer surface → broadcast-eligible without a count job
    Engine.triples(l, canonicalMap(spark, dir),
      canonRows = Some(3L * GazetteerSize))
  }
}
