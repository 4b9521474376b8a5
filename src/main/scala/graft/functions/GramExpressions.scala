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
  // GenericArrayData import retained for the shared empty singleton type
  private val EMPTY: GenericArrayData = Md5Hex.EMPTY_ARRAY

  /** Null elements are SKIPPED, including their separator — exactly what
    * concat_ws does in the lambda reference ("a", NULL, "b" → "a b"), so
    * the byte-identity contract holds even for nullable producers. */
  private def joined(toks: Array[Array[Byte]], start: Int, n: Int): Array[Byte] = {
    var len = 0
    var cnt = 0
    var j = 0
    while (j < n) {
      val t = toks(start + j)
      if (t != null) { len += t.length; cnt += 1 }
      j += 1
    }
    if (cnt > 1) len += cnt - 1
    val out = new Array[Byte](len)
    var p = 0
    var first = true
    j = 0
    while (j < n) {
      val t = toks(start + j)
      if (t != null) {
        if (!first) { out(p) = Md5Hex.SPACE_BYTE; p += 1 }
        System.arraycopy(t, 0, out, p, t.length)
        p += t.length
        first = false
      }
      j += 1
    }
    out
  }

  /** Distinct space-joined n-grams, first-encounter order (identical to
    * array_distinct over the concat_ws transform, including concat_ws's
    * null-skipping). Empty when len(w) < n. */
  def distinctGrams(arr: ArrayData, n: Int): ArrayData = {
    val c = arr.numElements()
    if (c < n) return EMPTY
    val toks = Md5Hex.tokenBytes(arr)
    val seen = new java.util.LinkedHashSet[UTF8String]()
    var i = 0
    while (i <= c - n) {
      seen.add(UTF8String.fromBytes(joined(toks, i, n)))
      i += 1
    }
    Md5Hex.toArrayData(seen)
  }

  /** Distinct lowercase md5-hex of the space-joined n-grams,
    * first-encounter order (null elements skipped like array_join does).
    * Empty when len(w) < n. */
  def gramMd5Hexes(arr: ArrayData, n: Int): ArrayData = {
    val c = arr.numElements()
    if (c < n) return EMPTY
    val toks = Md5Hex.tokenBytes(arr)
    val seen = new java.util.LinkedHashSet[UTF8String]()
    var i = 0
    while (i <= c - n) {
      val md = Md5Hex.digest()
      var first = true
      var j = 0
      while (j < n) {
        val t = toks(i + j)
        if (t != null) {
          if (!first) md.update(Md5Hex.SPACE_BYTE)
          md.update(t)
          first = false
        }
        j += 1
      }
      seen.add(Md5Hex.toHex(md.digest()))
      i += 1
    }
    Md5Hex.toArrayData(seen)
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
