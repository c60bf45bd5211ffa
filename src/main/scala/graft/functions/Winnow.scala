package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing document fingerprints (Schleimer/Wilkerson/Aiken): rolling
  * polynomial hashes of char k-grams over the UTF-8 bytes, then the
  * minimum of each sliding window of `w` hashes, deduplicated. Robust to
  * tokenization differences, byte-level — complements the token-shingle
  * dedup paths. CodegenFallback: the eval is already one tight JVM loop
  * per row (unlike Catalyst HOF chains there is nothing interpreted
  * per-element), so generated-source complexity isn't warranted. */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression with CodegenFallback {

  require(k > 0 && w > 0)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"winnow_fingerprints expects string, got ${other.sql}")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private val B = 257L
  // B^(k-1) for the rolling subtract, in wrapping long arithmetic
  private val Bk1: Long = {
    var p = 1L
    var i = 1
    while (i < k) { p *= B; i += 1 }
    p
  }

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val n = bytes.length
    if (n < k) return new GenericArrayData(Array.emptyLongArray)
    val nh = n - k + 1
    val hashes = new Array[Long](nh)
    var h = 0L
    var i = 0
    while (i < k) { h = h * B + (bytes(i) & 0xff); i += 1 }
    hashes(0) = h
    i = 1
    while (i < nh) {
      h = (h - (bytes(i - 1) & 0xff) * Bk1) * B + (bytes(i + k - 1) & 0xff)
      hashes(i) = h
      i += 1
    }
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    if (nh <= w) {
      var m = hashes(0)
      i = 1
      while (i < nh) { if (hashes(i) < m) m = hashes(i); i += 1 }
      seen.add(m)
    } else {
      i = 0
      while (i + w <= nh) {
        var m = hashes(i)
        var j = i + 1
        while (j < i + w) { if (hashes(j) < m) m = hashes(j); j += 1 }
        seen.add(m)
        i += 1
      }
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var p = 0
    while (it.hasNext) { out(p) = it.next(); p += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprints =
    copy(child = newChild)
}

/** Winnowing fingerprints over an ENGINE-PORTABLE hash: char k-gram
  * hashes are the base-31 mod-1e9+7 polynomial fold of CODEPOINTS (the
  * same family as ShinglePoly3/the minhash oracle), rolled with modular
  * add/remove instead of [[WinnowFingerprints]]'s wrapping-overflow
  * byte hash — so a DuckDB oracle can recompute every gram hash with
  * list_reduce over unicode(char) and replay the window-min selection
  * exactly. Same selection semantics (sliding window of w, distinct
  * mins, guarantee: any match of length >= k+w-1 shares a fingerprint). */
case class WinnowPolyFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression with CodegenFallback {

  require(k > 0 && w > 0)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"winnow_poly_fingerprints expects string, got ${other.sql}")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private val P = 1000000007L
  // 31^(k-1) mod P for the rolling removal
  private val Bk1: Long = {
    var p = 1L
    var i = 1
    while (i < k) { p = p * 31L % P; i += 1 }
    p
  }

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val cps = s.codePoints().toArray
    val n = cps.length
    if (n < k) return new GenericArrayData(Array.emptyLongArray)
    val nh = n - k + 1
    val hashes = new Array[Long](nh)
    var h = 0L
    var i = 0
    while (i < k) { h = (h * 31L + cps(i)) % P; i += 1 }
    hashes(0) = h
    i = 1
    while (i < nh) {
      // remove cps(i-1)*31^(k-1), shift, add cps(i+k-1) — all mod P
      h = ((h + P - cps(i - 1) % P * Bk1 % P) % P * 31L + cps(i + k - 1)) % P
      hashes(i) = h
      i += 1
    }
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    if (nh <= w) {
      var m = hashes(0)
      i = 1
      while (i < nh) { if (hashes(i) < m) m = hashes(i); i += 1 }
      seen.add(m)
    } else {
      i = 0
      while (i + w <= nh) {
        var m = hashes(i)
        var j = i + 1
        while (j < i + w) { if (hashes(j) < m) m = hashes(j); j += 1 }
        seen.add(m)
        i += 1
      }
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var p = 0
    while (it.hasNext) { out(p) = it.next(); p += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): WinnowPolyFingerprints =
    copy(child = newChild)
}

object Winnow {
  import org.apache.spark.sql.graftops.ColumnBridge

  /** Column wrapper: winnowing fingerprints of a text column. Window w
    * controls density (guarantee: any match of length >= k+w-1 shares a
    * fingerprint). Defaults k=12/w=16: 8-char grams are so common across
    * documents that the inverted-index join degenerates into hot-key
    * pair blowup (measured 55M candidate pairs vs 9M at sf0.1) and the
    * "overlap" signal is mostly shared stock phrases; 12-char grams at
    * half the density keep the guarantee (runs >= 27 chars) while the
    * candidate volume and join time drop ~6x. */
  def winnow_fingerprints(text: Column, k: Int = 12, w: Int = 16): Column =
    ColumnBridge.column(WinnowFingerprints(ColumnBridge.expression(text), k, w))

  /** Column wrapper: PORTABLE-hash winnowing fingerprints (mod-1e9+7
    * codepoint polynomial — SQL-oracle-replayable). Same k/w semantics. */
  def winnow_poly_fingerprints(text: Column, k: Int = 12, w: Int = 16): Column =
    ColumnBridge.column(WinnowPolyFingerprints(ColumnBridge.expression(text), k, w))
}
