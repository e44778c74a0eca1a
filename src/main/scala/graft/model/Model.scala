package graft.model

import org.apache.spark.sql.types._

/** Core data model of the KG-construction engine (SURVEY.md §1.2).
  *
  * A document is an ordered sequence of interleaved text and media
  * spans; `offset` carries document order. The per-row invariant
  * (BASELINE.json input_hint) is span-sequence equality on
  * (kind, text, media_ref, order) across any explode/regroup.
  */
final case class Span(kind: String, text: String, media_ref: String, offset: Int)

final case class Doc(doc_id: String, spans: Seq[Span])

object Model {
  val spanStruct: StructType = StructType(Seq(
    StructField("kind", StringType, nullable = false),
    StructField("text", StringType, nullable = false),
    StructField("media_ref", StringType, nullable = false),
    StructField("offset", IntegerType, nullable = false)))

  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", StringType, nullable = false),
    StructField("spans", ArrayType(spanStruct, containsNull = false), nullable = false)))

  /** Flat stage-table schema produced by exploding `docSchema`. */
  val spansSchema: StructType = StructType(Seq(
    StructField("doc_id", StringType, nullable = false),
    StructField("span_idx", IntegerType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("text", StringType, nullable = false),
    StructField("media_ref", StringType, nullable = false),
    StructField("offset", IntegerType, nullable = false)))

  final case class Mention(doc_id: String, span_idx: Int, begin: Int, end: Int,
                           surface: String, coarse_type: String)

  final case class Triple(subj: String, pred: String, obj: String)
}
