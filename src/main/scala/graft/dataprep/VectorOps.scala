package graft.dataprep

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector algebra over `array<float>` embedding columns as composed
  * higher-order built-ins — fully codegen'd, no UDF boxing (SURVEY.md
  * steer: functions, not UDFs). Elements are cast to double before any
  * arithmetic so results are reproducible against the DuckDB oracle at
  * 1-ulp level and stable across partitionings.
  */
object VectorOps {

  def toDouble(v: Column): Column = transform(v, x => x.cast("double"))

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x * x), lit(0.0), (acc, v) => acc + v))

  /** Cosine similarity of two float-array columns. */
  def cosine(a0: Column, b0: Column): Column = {
    val a = toDouble(a0)
    val b = toDouble(b0)
    dot(a, b) / (norm(a) * norm(b))
  }
}
