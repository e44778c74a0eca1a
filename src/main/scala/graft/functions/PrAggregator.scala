package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Precision/recall counters in one distributed pass (SURVEY.md §2.8 U5):
  * a typed `Aggregator[IN, BUF, OUT]` with an associative, commutative
  * merge — Spark runs it as partial aggregates per partition plus one
  * reduce, so the confusion matrix of 10^12 (predicted, actual) pairs
  * costs a single map-side-combined shuffle of 4 longs per partition.
  */
final case class PrCounts(tp: Long, fp: Long, fn: Long, tn: Long) {
  def precision: Double = if (tp + fp == 0) 0.0 else tp.toDouble / (tp + fp)
  def recall: Double = if (tp + fn == 0) 0.0 else tp.toDouble / (tp + fn)
}

object PrAggregator extends Aggregator[(Boolean, Boolean), PrCounts, PrCounts] {
  override def zero: PrCounts = PrCounts(0L, 0L, 0L, 0L)
  override def reduce(b: PrCounts, in: (Boolean, Boolean)): PrCounts = in match {
    case (true, true)   => b.copy(tp = b.tp + 1)
    case (true, false)  => b.copy(fp = b.fp + 1)
    case (false, true)  => b.copy(fn = b.fn + 1)
    case (false, false) => b.copy(tn = b.tn + 1)
  }
  override def merge(a: PrCounts, b: PrCounts): PrCounts =
    PrCounts(a.tp + b.tp, a.fp + b.fp, a.fn + b.fn, a.tn + b.tn)
  override def finish(r: PrCounts): PrCounts = r
  override def bufferEncoder: Encoder[PrCounts] = Encoders.product[PrCounts]
  override def outputEncoder: Encoder[PrCounts] = Encoders.product[PrCounts]
}
