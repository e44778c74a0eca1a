package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Primitive-loop dot product used by the similarity/dedup hot paths.
  *
  * The composable alternative (`aggregate(zip_with(a,b,*), 0.0, +)`)
  * evaluates an interpreted lambda per element with boxing — measured
  * ~20× slower over the sf0.1 embedding pair set. This expression reads
  * the unsafe array data directly (float or double elements, widened to
  * double) and codegens to a static-method call, so the surrounding
  * whole-stage codegen pipeline stays fused (SURVEY.md §2.8 preference:
  * custom Expression over UDF).
  */
object VecOps {
  /** Deterministic integer hyperplane weight for (plane, dim): two
    * Lehmer-RNG rounds mod 2^31-1, folded to [-999, 999]. Pure integer
    * arithmetic — bit-identical in any engine (the DuckDB oracles
    * replicate it verbatim), no float-summation-order hazard. */
  def planeWeight(p: Int, i: Int): Long = {
    val k = p.toLong * 131L + i.toLong + 7L
    var h = (k * 2654435761L) % 2147483647L
    h = (h * 48271L) % 2147483647L
    h % 1999L - 999L
  }

  /** Sign-bit LSH bucket over `planes` integer hyperplanes. Components
    * are quantized to milli-units (floor(x*1000 + 0.5) — exact and
    * identical under IEEE double in every engine) so each plane's dot
    * product is an exact 64-bit integer: no cross-engine (or
    * cross-summation-order) sign flips near the hyperplane. */
  def lshBucketF(a: ArrayData, planes: Int): Long = {
    val n = a.numElements()
    var bucket = 0L
    var p = 0
    while (p < planes) {
      var s = 0L
      var i = 0
      while (i < n) {
        val xq = Math.floor(a.getFloat(i).toDouble * 1000.0 + 0.5).toLong
        s += xq * planeWeight(p, i)
        i += 1
      }
      if (s >= 0) bucket |= (1L << p)
      p += 1
    }
    bucket
  }
  def lshBucketD(a: ArrayData, planes: Int): Long = {
    val n = a.numElements()
    var bucket = 0L
    var p = 0
    while (p < planes) {
      var s = 0L
      var i = 0
      while (i < n) {
        val xq = Math.floor(a.getDouble(i) * 1000.0 + 0.5).toLong
        s += xq * planeWeight(p, i)
        i += 1
      }
      if (s >= 0) bucket |= (1L << p)
      p += 1
    }
    bucket
  }

  def dotDD(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getDouble(i) * b.getDouble(i); i += 1 }
    s
  }
  def dotFF(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    s
  }
}

case class VecDot(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  private lazy val isFloat: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && left.dataType == right.dataType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"vec_dot needs two equal float/double arrays, got ${left.dataType} / ${right.dataType}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (isFloat) VecOps.dotFF(x, y) else VecOps.dotDD(x, y)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = if (isFloat) "dotFF" else "dotDD"
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VecOps.$fn($a, $b)")
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

object VecDot {
  def apply(a: Column, b: Column): Column =
    Bridge.toColumn(VecDot(Bridge.toExpression(a), Bridge.toExpression(b)))
}

/** Random-hyperplane LSH bucket id (VERDICT r1 #8: the interpreted
  * 6×64-term column tree rebuilt the bucket per row outside codegen;
  * this is one fused primitive loop, codegen'd like [[VecDot]]). */
case class VecLshBucket(child: Expression, planes: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "vec_lsh_bucket"

  private lazy val isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) if planes >= 1 && planes <= 62 =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"vec_lsh_bucket needs array<float|double> and 1<=planes<=62, got $other / $planes")
    }

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    if (isFloat) VecOps.lshBucketF(x, planes) else VecOps.lshBucketD(x, planes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = if (isFloat) "lshBucketF" else "lshBucketD"
    defineCodeGen(ctx, ev, a => s"graft.functions.VecOps.$fn($a, $planes)")
  }

  override protected def withNewChildInternal(newChild: Expression): VecLshBucket =
    copy(child = newChild)
}

object VecLshBucket {
  def apply(a: Column, planes: Int): Column =
    Bridge.toColumn(VecLshBucket(Bridge.toExpression(a), planes))
}
