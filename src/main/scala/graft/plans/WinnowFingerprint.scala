package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing document fingerprint (Schleimer, Wilkerson, Aiken,
  * "Winnowing: Local Algorithms for Document Fingerprinting", SIGMOD'03
  * — the MOSS algorithm), as a native Catalyst expression.
  *
  * Rolling polynomial hash over character k-grams; within every window
  * of `w` consecutive k-gram hashes the minimum is selected (rightmost
  * on ties), consecutive repeats dropped. Guarantees: any shared
  * substring of length >= w + k - 1 contributes at least one shared
  * fingerprint, and expected sketch density is 2/(w+1) — a compact,
  * position-robust sketch for character-level near-dup detection
  * (plagiarism/boilerplate), complementing word-shingle MinHash.
  *
  * Output: array<long> of selected k-gram hashes in document order
  * (callers array_distinct for set semantics). Documents shorter than k
  * characters yield a single whole-text hash; empty/null follow
  * null-in/null-out with [] for empty.
  */
case class WinnowFingerprint(child: Expression, k: Int, w: Int)
  extends UnaryExpression with CodegenFallback {

  require(k >= 2 && w >= 1, "need k >= 2, w >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"winnow_fingerprint requires string, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_fingerprint"

  private val B = RollingHash.B // shared polynomial base (see RollingHash)
  // B^(k-1) for removing the outgoing byte, wrapping arithmetic
  private val Bk1 = {
    var p = 1L
    var i = 0
    while (i < k - 1) { p *= B; i += 1 }
    p
  }

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val n = bytes.length
    if (n == 0) return new GenericArrayData(Array.empty[Long])
    if (n < k) {
      var h = 0L
      var i = 0
      while (i < n) { h = h * B + (bytes(i) & 0xFF); i += 1 }
      return new GenericArrayData(Array(h))
    }
    // rolling k-gram hashes
    val m = n - k + 1
    val hashes = new Array[Long](m)
    var h = 0L
    var i = 0
    while (i < k) { h = h * B + (bytes(i) & 0xFF); i += 1 }
    hashes(0) = h
    i = 1
    while (i < m) {
      h = (h - (bytes(i - 1) & 0xFF) * Bk1) * B + (bytes(i + k - 1) & 0xFF)
      hashes(i) = h
      i += 1
    }
    if (m <= w) {
      // one window: single minimum (rightmost)
      var min = hashes(0)
      var j = 1
      while (j < m) { if (hashes(j) <= min) min = hashes(j); j += 1 }
      return new GenericArrayData(Array(min))
    }
    // winnow: rightmost minimum of each w-window, dedup consecutive picks
    val out = new scala.collection.mutable.ArrayBuffer[Long](2 * m / (w + 1) + 4)
    var lastPicked = -1
    var start = 0
    while (start + w <= m) {
      var minIdx = start
      var j = start + 1
      while (j < start + w) {
        if (hashes(j) <= hashes(minIdx)) minIdx = j
        j += 1
      }
      if (minIdx != lastPicked) {
        out += hashes(minIdx)
        lastPicked = minIdx
      }
      start += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprint =
    copy(child = newChild)
}
