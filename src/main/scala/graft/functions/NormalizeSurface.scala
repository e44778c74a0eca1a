package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Surface-form normalizer used across mention detection and anchor
  * lookup (SURVEY.md §2.8 U2).
  *
  * Semantics (kept deliberately SQL-expressible so DuckDB oracles can
  * replicate it): lower-case, replace every maximal run of characters
  * outside [a-z0-9] with a single space, trim. Equivalent to
  * `trim(regexp_replace(lower(x), '[^a-z0-9]+', ' '))` but implemented
  * as a single allocation-light pass so whole-stage codegen inlines a
  * static call instead of a regex engine.
  */
object Normalizer {
  def normalize(u: UTF8String): UTF8String = {
    val s = u.toString
    val n = s.length
    val sb = new java.lang.StringBuilder(n)
    var pendingSpace = false
    var i = 0
    while (i < n) {
      val c0 = s.charAt(i)
      val c = Character.toLowerCase(c0)
      if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) {
        if (pendingSpace && sb.length > 0) sb.append(' ')
        pendingSpace = false
        sb.append(c)
      } else {
        pendingSpace = true
      }
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }
}

case class NormalizeSurface(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "normalize_surface"

  override def nullSafeEval(v: Any): Any =
    Normalizer.normalize(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Normalizer.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): NormalizeSurface =
    copy(child = newChild)
}

object NormalizeSurface {
  /** Column API: `normalize_surface($"text")`. */
  def apply(c: Column): Column =
    Bridge.toColumn(NormalizeSurface(Bridge.toExpression(c)))
}
