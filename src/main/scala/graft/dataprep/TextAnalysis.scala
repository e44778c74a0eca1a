package graft.dataprep

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.NormalizeSurface

/** Text-analysis operators for training-data curation (task brief):
  * language-ID (marker-token heuristic), quality scoring, token
  * counting, document fingerprinting. All pure column algebra over the
  * scan — no shuffle except the langid argmax, which is a broadcast
  * join + hash aggregate.
  */
object TextAnalysis {

  /** (lang, marker) rows; tiny — broadcast side of the langid join. */
  val markers: Seq[(String, String)] = Seq(
    "en" -> "the", "en" -> "a", "en" -> "of", "en" -> "and", "en" -> "to",
    "es" -> "el", "es" -> "la", "es" -> "de", "es" -> "que", "es" -> "y",
    "de" -> "der", "de" -> "die", "de" -> "das", "de" -> "und", "de" -> "ist")

  /** N-gram-style language-ID heuristic: count marker tokens per
    * language, argmax with (count desc, lang asc) tie-break, 'unknown'
    * when no marker occurs. */
  def langId(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    val m = broadcast(markers.toDF("cand_lang", "marker"))
    val toks = documents.select(col("doc_id"),
      explode(Dedup.tokens(col("text"))).as("tok"))
    val scores = toks.join(m, col("tok") === col("marker"))
      .groupBy(col("doc_id"), col("cand_lang"))
      .agg(count(lit(1)).as("n_markers"))
    // argmax with (count desc, lang asc) tie-break: min over the
    // lexicographic struct (-count, lang) — total order, deterministic.
    val best = scores.groupBy("doc_id")
      .agg(min_by(struct(col("cand_lang"), col("n_markers")),
        struct((-col("n_markers")).as("neg_n"), col("cand_lang"))).as("b"))
      .select(col("doc_id"), col("b.cand_lang").as("predicted_lang"),
        col("b.n_markers").as("n_markers"))
    documents.select(col("doc_id").as("d_id"))
      .join(best, col("d_id") === col("doc_id"), "left")
      .select(col("d_id").as("doc_id"),
        coalesce(col("predicted_lang"), lit("unknown")).as("predicted_lang"),
        coalesce(col("n_markers"), lit(0L)).as("n_markers"))
  }

  /** Quality features: all integer/ratio arithmetic ⇒ bit-exact vs the
    * SQL oracle. Documents with zero [a-z0-9] tokens are excluded (their
    * ratios are undefined — 0/0 — and they carry no quality signal). */
  def quality(documents: DataFrame): DataFrame = {
    val toks = Dedup.tokens(col("text"))
    val nToks = size(toks).cast("long")
    val alnum = length(regexp_replace(lower(col("text")), "[^a-z0-9]", "")).cast("long")
    val stop = size(filter(toks, t =>
      t === "the" || t === "a" || t === "of" || t === "and" || t === "to")).cast("long")
    documents.where(nToks >= 1).select(
      col("doc_id"), col("n_chars"),
      nToks.as("n_tokens"),
      (alnum.cast("double") / nToks.cast("double")).as("avg_token_len"),
      (stop.cast("double") / nToks.cast("double")).as("stopword_ratio"),
      ((length(col("text")) - alnum -
        (size(split(col("text"), " ", -1)) - 1)).cast("long")).as("n_punct"))
  }

  /** Token counting: whitespace tokens and a BPE-ish regex segmentation. */
  def tokenCounts(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      size(filter(split(col("text"), " ", -1), t => t =!= "")).cast("long").as("n_ws_tokens"),
      size(regexp_extract_all(lower(col("text")), lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0)))
        .cast("long").as("n_bpe_tokens"))

  /** Document fingerprint: md5 over the canonical normalized form —
    * normalization runs through the custom Catalyst expression
    * (graft.functions.NormalizeSurface, codegen'd). */
  def fingerprint(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      md5(NormalizeSurface(col("text")).cast("binary")).as("fingerprint"))
}
