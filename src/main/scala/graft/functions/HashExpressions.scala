package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native md5-prefix-as-long: `Md5Long(s, half)` returns bytes
  * [8·half, 8·half+8) of md5(s) as a BIG-ENDIAN signed long.
  *
  * Why a custom Expression (the DotProduct precedent): the repo's md5
  * parity idiom — `conv(substring(md5(s), p, n), 16, 10)` — materializes
  * a 32-char hex UTF8String per hash, allocates a substring, and parses
  * it back to a long with a per-character scan; on the token-level paths
  * (x2/x13 shingles, x7/x23 simhash, x11b rolling values, x20 sampling
  * keys) that formatting round-trip is pure overhead. This expression
  * digests once and hands back raw bytes as a long; hex-position values
  * are then shift/mask arithmetic INSIDE whole-stage codegen:
  *
  *   first 8 hex chars  ≡ md5_long64(s, 0) >>> 32
  *   first 4 hex chars  ≡ md5_long64(s, 0) >>> 48
  *   hex nibble p (0-based, p < 16) ≡ (md5_long64(s, 0) >>> (60 − 4p)) & 15
  *   hex chars 16..31 come from half = 1 the same way
  *
  * Equivalences hold because md5's hex rendering IS the big-endian
  * nibble sequence of the digest. The DuckDB oracles keep the
  * string-based derivation — the oracle hash gate proves the two
  * formulations agree on every query output.
  *
  * Determinism: MessageDigest("MD5") is the same RFC 1321 function both
  * engines' md5() exposes; a ThreadLocal digest instance is reused
  * across rows (no per-row allocation beyond the digest's own output).
  */
case class Md5Long(child: Expression, half: Int)
    extends UnaryExpression {

  require(half == 0 || half == 1, s"md5_long64 half must be 0 or 1, got $half")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"md5_long64 expects string, got $t")
  }

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    Md5Long.compute(input.asInstanceOf[UTF8String], half)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5Long.compute($c, $half)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Md5Long {
  /** Per-thread digest + a one-entry memo of the last input: callers
    * that need both halves of one value (x13's shingle path) evaluate
    * Md5Long(s, 0) and Md5Long(s, 1) in the same projection, and the
    * memo collapses that to ONE digest run. The memo key is a defensive
    * copy — UTF8String.getBytes can expose a reader-owned buffer that is
    * reused for the next row, so holding the original array would make
    * the cache key mutate under us. */
  private final class State {
    val md: java.security.MessageDigest = java.security.MessageDigest.getInstance("MD5")
    var lastKey: Array[Byte] = _
    var lastDigest: Array[Byte] = _
  }
  private val states = new ThreadLocal[State] {
    override def initialValue(): State = new State
  }

  /** Called from both the interpreted path and generated code. */
  def compute(s: UTF8String, half: Int): Long = {
    val st = states.get()
    val b = s.getBytes
    if (st.lastKey == null || !java.util.Arrays.equals(st.lastKey, b)) {
      st.md.reset()
      st.lastDigest = st.md.digest(b)
      st.lastKey = java.util.Arrays.copyOf(b, b.length)
    }
    val digest = st.lastDigest
    val off = half * 8
    var r = 0L
    var i = 0
    while (i < 8) {
      r = (r << 8) | (digest(off + i) & 0xFFL)
      i += 1
    }
    r
  }
}

object HashFunctions {
  /** md5_long64(s, half): bytes [8·half, 8·half+8) of md5(s) as a long. */
  def md5Long(s: Column, half: Int): Column =
    GraftBridge.column(Md5Long(GraftBridge.expression(s), half))

  /** Value of the 4-hex-char slice at 0-based position 4·slice (slice
    * < 4) WITHIN one digest half `h` — for half 0 this equals
    * conv(substring(md5(s), 4·slice+1, 4), 16, 10); for half 1 the hex
    * positions are offset by 16 (x13 passes h1 for slices 4–7). */
  def md5Hex4(h: Column, slice: Int): Column = {
    require(slice >= 0 && slice < 4, s"slice must be 0..3, got $slice")
    org.apache.spark.sql.functions.shiftrightunsigned(h, 48 - 16 * slice)
      .bitwiseAND(org.apache.spark.sql.functions.lit(0xFFFFL))
  }

  /** Hex nibble value at 0-based position p (< 16) of one md5 half —
    * equals conv(substring(md5(s), p+1, 1), 16, 10) for half 0. */
  def md5Nibble(h: Column, p: Int): Column = {
    require(p >= 0 && p < 16, s"nibble position must be 0..15, got $p")
    org.apache.spark.sql.functions.shiftrightunsigned(h, 60 - 4 * p)
      .bitwiseAND(org.apache.spark.sql.functions.lit(0xFL))
  }
}
