package graft.dataprep

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.functions.VecDot

/** Vector algebra over embedding columns. The dot-product core is the
  * codegen'd primitive-loop expression [[graft.functions.VecDot]]
  * (float elements widened to double — numerically identical to casting
  * the array to DOUBLE[] first, which is what the DuckDB oracles do).
  */
object VectorOps {

  def dot(a: Column, b: Column): Column = VecDot(a, b)

  def norm(a: Column): Column = sqrt(VecDot(a, a))

  /** Cosine similarity of two same-typed float/double array columns.
    * When a norm is already materialized on the row, prefer
    * `dot(a,b) / (normA * normB)` to avoid recomputing it per pair. */
  def cosine(a: Column, b: Column): Column =
    VecDot(a, b) / (norm(a) * norm(b))
}
