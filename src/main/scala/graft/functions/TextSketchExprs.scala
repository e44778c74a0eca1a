package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest
import java.util.Locale

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass text sketches as codegen'd expressions (round 2).
  *
  * The composed forms (posexplode tokens → window lead → groupBy with
  * 32/60 aggregates) pay one doc_id shuffle + sort + a wide hash
  * aggregate PER SKETCH. Every sketch here is a pure function of one
  * document, so each becomes a single projection inside the scan's
  * whole-stage-codegen — zero shuffles, and at 100 TB the dedup
  * signature pass is exactly one read of the corpus.
  *
  * Bit-parity contracts (verified by the driver's DuckDB oracles and
  * `TextSketchSpec`): tokenization ≡ `split(lower(text),'[^a-z0-9]+')`
  * minus empties; shingle = 3 tokens joined by ' '; h1/h2 = md5 hex
  * chars 1-8 / 9-16 as unsigned ints (≡ `('0x'||substring(md5(s),o,8))
  * ::BIGINT`); permutation g_i = (h1 + i*h2) mod 4294967291; simhash
  * token hash = md5 hex chars 1-15 (60 bits).
  */
object TextSketch {

  val PermMod = 4294967291L

  private val md5tl: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** ≡ split(lower(text), "[^a-z0-9]+") with empties dropped. Lowercase
    * via String.toLowerCase(Locale.ROOT) — locale-independent by
    * construction. CAVEAT (ADVICE r2): Spark's `lower` goes through
    * UTF8String.toLowerCase, which consults the DEFAULT JVM locale for
    * non-ASCII strings (Turkish 'I' → dotless 'ı'), so the documented
    * bit-parity between this one-pass path, the Column tokenizer
    * (graft.dataprep.Dedup.tokens) and the DuckDB oracle holds for
    * ASCII input — which the [a-z0-9] token alphabet then guarantees
    * for every token — but the LOWERCASING step itself is only
    * contract-identical on ASCII text or under a root-locale JVM
    * (fixtures are ASCII; production should pin -Duser.language). */
  def tokenize(text: UTF8String): Array[String] = {
    val s = text.toString.toLowerCase(Locale.ROOT)
    val out = new ArrayBuffer[String]()
    val n = s.length
    var i = 0
    while (i < n) {
      var c = s.charAt(i)
      if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) {
        val start = i
        var j = i
        var run = true
        while (j < n && run) {
          c = s.charAt(j)
          if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) j += 1 else run = false
        }
        out += s.substring(start, j)
        i = j
      } else i += 1
    }
    out.toArray
  }

  @inline private def beInt(d: Array[Byte], off: Int): Long =
    ((d(off) & 0xffL) << 24) | ((d(off + 1) & 0xffL) << 16) |
      ((d(off + 2) & 0xffL) << 8) | (d(off + 3) & 0xffL)

  /** MinHash signature over the doc's DISTINCT 3-token shingles, or
    * null when the doc has fewer than 3 tokens (no shingle exists). */
  def minhashSig(text: UTF8String, perms: Int): ArrayData = {
    val toks = tokenize(text)
    if (toks.length < 3) return null
    val mins = Array.fill(perms)(Long.MaxValue)
    val seen = new java.util.HashSet[String]()
    val md = md5tl.get()
    var i = 0
    while (i + 2 < toks.length) {
      val sh = toks(i) + " " + toks(i + 1) + " " + toks(i + 2)
      if (seen.add(sh)) {
        md.reset()
        val d = md.digest(sh.getBytes(StandardCharsets.UTF_8))
        val h1 = beInt(d, 0)
        val h2 = beInt(d, 4)
        var p = 0
        while (p < perms) {
          val g = (h1 + p.toLong * h2) % PermMod
          if (g < mins(p)) mins(p) = g
          p += 1
        }
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(mins)
  }

  /** Distinct 3-token shingles (insertion order), or null when none. */
  def shingleSet(text: UTF8String): ArrayData = {
    val toks = tokenize(text)
    if (toks.length < 3) return null
    val seen = new java.util.LinkedHashSet[String]()
    var i = 0
    while (i + 2 < toks.length) {
      seen.add(toks(i) + " " + toks(i + 1) + " " + toks(i + 2))
      i += 1
    }
    val out = new Array[Any](seen.size())
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(out)
  }

  /** 60-bit SimHash over tokens WITH multiplicity, or null when the doc
    * has no [a-z0-9] token. */
  def simhash60(text: UTF8String): java.lang.Long = {
    val toks = tokenize(text)
    if (toks.isEmpty) return null
    val counts = new Array[Int](60)
    val md = md5tl.get()
    var i = 0
    while (i < toks.length) {
      md.reset()
      val d = md.digest(toks(i).getBytes(StandardCharsets.UTF_8))
      // md5 hex chars 1-15 = bytes 0..6 plus the high nibble of byte 7
      var h = 0L
      var b = 0
      while (b < 7) { h = (h << 8) | (d(b) & 0xffL); b += 1 }
      h = (h << 4) | ((d(7) & 0xf0L) >> 4)
      var bit = 0
      while (bit < 60) {
        if (((h >> bit) & 1L) == 1L) counts(bit) += 1 else counts(bit) -= 1
        bit += 1
      }
      i += 1
    }
    var out = 0L
    var bit = 0
    while (bit < 60) {
      if (counts(bit) > 0) out |= (1L << bit)
      bit += 1
    }
    java.lang.Long.valueOf(out)
  }
}

sealed trait TextSketchExpr extends UnaryExpression {
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"$prettyName needs a string, got $other")
  }
}

/** `shingle_minhash(text)` → array<bigint> of `perms` MinHash minima;
  * null for docs with <3 tokens. */
case class ShingleMinHash(child: Expression, perms: Int) extends TextSketchExpr {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_minhash"

  override def nullSafeEval(v: Any): Any =
    TextSketch.minhashSig(v.asInstanceOf[UTF8String], perms)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.TextSketch.minhashSig($c, $perms);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): ShingleMinHash =
    copy(child = newChild)
}

object ShingleMinHash {
  def apply(c: Column, perms: Int): Column =
    Bridge.toColumn(ShingleMinHash(Bridge.toExpression(c), perms))
}

/** `shingle_set(text)` → array<string> of distinct 3-token shingles;
  * null for docs with <3 tokens. */
case class ShingleSet(child: Expression) extends TextSketchExpr {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "shingle_set"

  override def nullSafeEval(v: Any): Any =
    TextSketch.shingleSet(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.TextSketch.shingleSet($c);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): ShingleSet =
    copy(child = newChild)
}

object ShingleSet {
  def apply(c: Column): Column = Bridge.toColumn(ShingleSet(Bridge.toExpression(c)))
}

/** `simhash60(text)` → bigint; null for docs with no token. */
case class SimHash60(child: Expression) extends TextSketchExpr {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash60"

  override def nullSafeEval(v: Any): Any =
    TextSketch.simhash60(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val r = ctx.freshName("simhashR")
    nullSafeCodeGen(ctx, ev, c => s"""
      java.lang.Long $r = graft.functions.TextSketch.simhash60($c);
      ${ev.isNull} = $r == null;
      ${ev.value} = ${ev.isNull} ? -1L : $r.longValue();
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash60 =
    copy(child = newChild)
}

object SimHash60 {
  def apply(c: Column): Column = Bridge.toColumn(SimHash60(Bridge.toExpression(c)))
}
