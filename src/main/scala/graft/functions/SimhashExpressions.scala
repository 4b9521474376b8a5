package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.types._

/** Native per-document SimHash — x7's 16-bit and x23's 64-bit
  * fingerprints in one pass over the token array.
  *
  * Why a custom Expression, and why it beats even the column-wise
  * aggregation: the previous shape exploded tokens to rows and summed
  * nBits ±1 contribution COLUMNS through a hash aggregation — already
  * 16× better than a (token × bit) explode, but still one corpus-wide
  * explode plus a doc_id shuffle per fingerprint run. SimHash is a
  * per-document reduction over its own tokens, so it needs NO shuffle at
  * all: this expression digests each token once (ThreadLocal MD5),
  * accumulates the ±1 votes in a local int array, and emits the packed
  * fingerprint — the whole operator becomes scan → project.
  *
  * Bit rules (identical to the aggregation forms they replace, so every
  * downstream value — x7's fingerprint column, x23's band slices and
  * Hamming verify, the DuckDB oracles — is unchanged):
  *   16-bit (x7):  bit j set per token iff md5 hex nibble j ≥ 8
  *   64-bit (x23): bit j set per token iff bit (j mod 4) of nibble
  *                 (j div 4) is set
  * A document bit is set iff its ±1 vote sum is positive. Weighted by
  * the token MULTISET (duplicates vote once each), exactly like the
  * exploded rows did. Empty array → all sums 0 → fingerprint 0. */
case class SimhashBits(child: Expression, nBits: Int) extends UnaryExpression {

  require(nBits == 16 || nBits == 64, s"simhash_bits supports 16 or 64 bits, got $nBits")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"simhash_bits expects array<string>, got $t")
  }

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    SimhashBits.compute(input.asInstanceOf[ArrayData], nBits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimhashBits.compute($c, $nBits)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimhashBits {
  /** Called from both the interpreted path and generated code. */
  def compute(arr: ArrayData, nBits: Int): Long = {
    val n = arr.numElements()
    val votes = new Array[Int](nBits)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) {
        // a null token votes -1 on every bit — the aggregation reference's
        // when(md5Nibble(null, ...) ...).otherwise(-1) semantics
        var j = 0
        while (j < nBits) { votes(j) -= 1; j += 1 }
      } else {
        val d = Md5Hex.digest().digest(arr.getUTF8String(i).getBytes)
        val h = Md5Hex.half0(d) // == Md5Long(t, 0)
        var j = 0
        if (nBits == 16) {
          while (j < 16) {
            val nib = (h >>> (60 - 4 * j)) & 15L
            votes(j) += (if (nib >= 8) 1 else -1)
            j += 1
          }
        } else {
          while (j < 64) {
            val nib = (h >>> (60 - 4 * (j / 4))) & 15L
            votes(j) += (if ((nib & (1L << (j % 4))) != 0) 1 else -1)
            j += 1
          }
        }
      }
      i += 1
    }
    var sh = 0L
    var j = 0
    while (j < nBits) {
      if (votes(j) > 0) sh |= (1L << j)
      j += 1
    }
    sh
  }
}

object SimhashFunctions {
  /** simhash_bits(w, nBits): per-document SimHash over the token array —
    * codegen'd, zero-shuffle. */
  def simhashBits(w: Column, nBits: Int): Column =
    GraftBridge.column(SimhashBits(GraftBridge.expression(w), nBits))
}
