package graft.kg

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Interleaved-corpus synthesis and the explode/regroup pair.
  *
  * The engine's native input is the interleaved-span corpus
  * (graft.model.Model.docSchema). The driver testdata has no nested
  * corpus, so `docs` derives one *deterministically* from the flat
  * `documents` table with arithmetic that a DuckDB oracle can replicate
  * row-for-row (SURVEY.md §3.2): every document becomes a body text
  * span, every doc_id % 3 == 0 gains an image span (caption + media
  * ref), every doc_id % 5 == 0 gains a trailing appendix text span.
  * Offsets are contiguous positions, so span_idx == offset.
  */
object Corpus {

  /** (doc_id string, spans array<struct<kind,text,media_ref,offset>>). */
  def docs(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    val body = struct(
      lit("text").as("kind"), col("text").as("text"),
      lit("").as("media_ref"), lit(0).as("offset"))
    val image = struct(
      lit("image").as("kind"),
      concat(lit("figure "), col("lang")).as("text"),
      concat(lit("media://img/"), col("doc_id")).as("media_ref"),
      lit(0).as("offset"))
    val appendix = struct(
      lit("text").as("kind"),
      concat(lit("appendix "), col("source")).as("text"),
      lit("").as("media_ref"), lit(0).as("offset"))
    d.select(
      col("doc_id").cast("string").as("doc_id"),
      filter(
        array(
          body,
          when(col("doc_id") % 3 === 0, image),
          when(col("doc_id") % 5 === 0, appendix)),
        x => x.isNotNull).as("raw"))
      // re-stamp offset = final array position (contiguous document order)
      .select(col("doc_id"),
        transform(col("raw"), (x, i) => struct(
          x.getField("kind").as("kind"),
          x.getField("text").as("text"),
          x.getField("media_ref").as("media_ref"),
          i.cast("int").as("offset"))).as("spans"))
  }

  /** P3 span explode: docs → flat spans, position-preserving.
    * `posexplode` is a Catalyst Generator — stays inside the scan stage,
    * no shuffle. */
  def explodeSpans(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), posexplode(col("spans")).as(Seq("span_idx", "s")))
      .select(col("doc_id"), col("span_idx").cast("int").as("span_idx"),
        col("s.kind").as("kind"), col("s.text").as("text"),
        col("s.media_ref").as("media_ref"), col("s.offset").as("offset"))

  /** P3 explode + in-row media adjacency: the exploded columns of
    * [[explodeSpans]] plus `adj_media` — the media_refs of the spans
    * DIRECTLY adjacent (span_idx ± 1) to this one, read from the
    * document's own spans array at explode time. Adjacency is a
    * per-document property, so it belongs in the scan-side projection:
    * this is what lets the triple stage emit depictedIn triples with
    * NO media join and NO second corpus scan (VERDICT r3 #6 — the old
    * form planned the corpus twice and shuffle-joined links against
    * corpus-sized media rows on doc_id at 100 TB). Parity with the
    * join form it replaces: adjacent spans qualify iff kind is
    * non-null and not 'text' (the old media-branch predicate), and null
    * media_refs are dropped (the emit-time isNotNull filter) while
    * empty-string refs are kept. Still a pure Generate + projection —
    * zero shuffles at any corpus size. */
  def explodeSpansAdj(docs: DataFrame): DataFrame = {
    // try_element_at: 1-based, null out-of-range; span_idx (0-based)
    // is the 1-based index of the PREVIOUS span. The `when` guards
    // index 0 (illegal even for try_element_at); CaseWhen only
    // evaluates the taken branch.
    val prev = when(col("span_idx") > 0, try_element_at(col("spans"), col("span_idx")))
    val next = try_element_at(col("spans"), col("span_idx") + lit(2))
    docs.select(col("doc_id"), col("spans"),
        posexplode(col("spans")).as(Seq("span_idx", "s")))
      .select(col("doc_id"), col("span_idx").cast("int").as("span_idx"),
        col("s.kind").as("kind"), col("s.text").as("text"),
        col("s.media_ref").as("media_ref"), col("s.offset").as("offset"),
        filter(
          transform(
            filter(array(prev, next), x =>
              x.isNotNull && x.getField("kind").isNotNull &&
                x.getField("kind") =!= "text"),
            x => x.getField("media_ref")),
          r => r.isNotNull).as("adj_media"))
  }

  /** P4 inverse: reassemble the per-doc ordered span array. One shuffle
    * on doc_id; `array_sort` on the span_idx witness restores order
    * regardless of shuffle nondeterminism. */
  def regroupSpans(spans: DataFrame): DataFrame =
    spans
      .groupBy(col("doc_id"))
      .agg(array_sort(collect_list(struct(
        col("span_idx"), col("kind"), col("text"),
        col("media_ref"), col("offset")))).as("ordered"))
      .select(col("doc_id"),
        transform(col("ordered"), x => struct(
          x.getField("kind").as("kind"),
          x.getField("text").as("text"),
          x.getField("media_ref").as("media_ref"),
          x.getField("offset").as("offset"))).as("spans"))
}
