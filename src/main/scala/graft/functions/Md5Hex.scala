package graft.functions

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Shared MD5/hex/array plumbing for the native text expressions
  * (WinnowFingerprints, Grams, SimhashBits) — one ThreadLocal digest and
  * one hex encoder, so digest handling and byte-sign masking can't drift
  * between the expression families. */
private[functions] object Md5Hex {
  private val digests = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  private val HEX = "0123456789abcdef".getBytes
  val SPACE_BYTE: Byte = ' '.toByte
  val EMPTY_ARRAY: GenericArrayData = new GenericArrayData(Array.empty[Any])

  def digest(): java.security.MessageDigest = {
    val md = digests.get()
    md.reset()
    md
  }

  /** Lowercase 32-char hex of a 16-byte digest, as UTF8String — the same
    * rendering Spark's and DuckDB's md5() produce. */
  def toHex(d: Array[Byte]): UTF8String = {
    val hex = new Array[Byte](32)
    var p = 0
    while (p < 16) {
      hex(2 * p) = HEX((d(p) >> 4) & 0xF)
      hex(2 * p + 1) = HEX(d(p) & 0xF)
      p += 1
    }
    UTF8String.fromBytes(hex)
  }

  /** First 8 digest bytes as the big-endian half-0 long (== Md5Long(t, 0)). */
  def half0(d: Array[Byte]): Long = {
    var h = 0L
    var b = 0
    while (b < 8) { h = (h << 8) | (d(b) & 0xFFL); b += 1 }
    h
  }

  /** Token byte views of a string array; a NULL element maps to null (the
    * callers implement the lambda forms' null-skipping join semantics). */
  def tokenBytes(arr: ArrayData): Array[Array[Byte]] = {
    val n = arr.numElements()
    val toks = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) {
      toks(i) = if (arr.isNullAt(i)) null else arr.getUTF8String(i).getBytes
      i += 1
    }
    toks
  }

  def toArrayData(seen: java.util.LinkedHashSet[UTF8String]): ArrayData = {
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }
}
