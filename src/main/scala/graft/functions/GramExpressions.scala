package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native n-gram shingling — the producer stage of every dedup lineage
  * (x2/x13 raw shingles; x29/x36/S8 gram-hash sets).
  *
  * Why custom Expressions (the WinnowFingerprints precedent): both
  * lambda forms — `array_distinct(transform(sequence(...), i ->
  * concat_ws(' ', element_at(w, i), ...)))` and the md5-hashing variant
  * with `array_join(slice(w, i, n), " ")` — are CodegenFallback HOF
  * chains interpreting O(len·n) expression nodes per document with an
  * allocation per gram. These run the identical dedup (first-encounter
  * order, same joined string) as single JVM passes.
  *
  * Values are byte-identical to the lambda forms (and gram ORDER is
  * irrelevant downstream anyway — every consumer explodes to rows), so
  * the DuckDB oracles are untouched; GraftExtensionsSpec pins exact
  * array equality against the lambda formulation regardless. */
case class DistinctGrams(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1, s"gram size must be >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"distinct_grams expects array<string>, got $t")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    Grams.distinctGrams(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Grams.distinctGrams($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Distinct md5-hex hashes of the n-grams (lowercase 32-char, the same
  * string `md5(array_join(slice(w, i, n), " "))` produced). */
case class GramMd5Hexes(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1, s"gram size must be >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"gram_md5_hexes expects array<string>, got $t")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    Grams.gramMd5Hexes(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Grams.gramMd5Hexes($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Grams {
  private val digests = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  private val HEX = "0123456789abcdef".getBytes
  private val SPACE_BYTE = ' '.toByte
  private val EMPTY = new GenericArrayData(Array.empty[Any])

  private def tokenBytes(arr: ArrayData): Array[Array[Byte]] = {
    val n = arr.numElements()
    val toks = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) {
      toks(i) = if (arr.isNullAt(i)) Array.emptyByteArray else arr.getUTF8String(i).getBytes
      i += 1
    }
    toks
  }

  private def joined(toks: Array[Array[Byte]], start: Int, n: Int): Array[Byte] = {
    var len = n - 1
    var j = 0
    while (j < n) { len += toks(start + j).length; j += 1 }
    val out = new Array[Byte](len)
    var p = 0
    j = 0
    while (j < n) {
      if (j > 0) { out(p) = SPACE_BYTE; p += 1 }
      val t = toks(start + j)
      System.arraycopy(t, 0, out, p, t.length)
      p += t.length
      j += 1
    }
    out
  }

  /** Distinct space-joined n-grams, first-encounter order (identical to
    * array_distinct over the transform). Empty when len(w) < n. */
  def distinctGrams(arr: ArrayData, n: Int): ArrayData = {
    val c = arr.numElements()
    if (c < n) return EMPTY
    val toks = tokenBytes(arr)
    val seen = new java.util.LinkedHashSet[UTF8String]()
    var i = 0
    while (i <= c - n) {
      seen.add(UTF8String.fromBytes(joined(toks, i, n)))
      i += 1
    }
    toArrayData(seen)
  }

  /** Distinct lowercase md5-hex of the space-joined n-grams,
    * first-encounter order. Empty when len(w) < n. */
  def gramMd5Hexes(arr: ArrayData, n: Int): ArrayData = {
    val c = arr.numElements()
    if (c < n) return EMPTY
    val toks = tokenBytes(arr)
    val md = digests.get()
    val seen = new java.util.LinkedHashSet[UTF8String]()
    var i = 0
    while (i <= c - n) {
      md.reset()
      var j = 0
      while (j < n) {
        if (j > 0) md.update(SPACE_BYTE)
        md.update(toks(i + j))
        j += 1
      }
      val d = md.digest()
      val hex = new Array[Byte](32)
      var p = 0
      while (p < 16) {
        hex(2 * p) = HEX((d(p) >> 4) & 0xF)
        hex(2 * p + 1) = HEX(d(p) & 0xF)
        p += 1
      }
      seen.add(UTF8String.fromBytes(hex))
      i += 1
    }
    toArrayData(seen)
  }

  private def toArrayData(seen: java.util.LinkedHashSet[UTF8String]): ArrayData = {
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }
}

object GramFunctions {
  /** distinct_grams(w, n): distinct space-joined n-grams — codegen'd. */
  def distinctGrams(w: Column, n: Int): Column =
    GraftBridge.column(DistinctGrams(GraftBridge.expression(w), n))

  /** gram_md5_hexes(w, n): distinct md5-hex n-gram hashes — codegen'd. */
  def gramMd5Hexes(w: Column, n: Int): Column =
    GraftBridge.column(GramMd5Hexes(GraftBridge.expression(w), n))
}
