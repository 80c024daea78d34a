package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native hash-sketch expressions.
  *
  * The higher-order-function forms in TextFunctions are correct but
  * Spark evaluates HOF lambdas interpreted (no codegen), so the 64-wide
  * inner loops pay per-element dispatch. These expressions compute
  * BIT-IDENTICAL values (spec-enforced) in one tight JVM loop per row.
  * CodegenFallback is fine here: the cost was per-ELEMENT dispatch, not
  * per-row dispatch.
  *
  * Hash compatibility: Spark's `xxhash64(x)` = fold of XXH64 with seed
  * 42; `xxhash64(seed, h)` folds the int seed then the long. Replicated
  * below via the same XXH64 primitives.
  */
object HashSketches {
  val SparkHashSeed = 42L

  def hashUtf8(s: UTF8String, seed: Long): Long =
    XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes(), seed)
}

/** SimHash-64 over a token array: each token's xxhash64 votes its bits;
  * sign of the vote total forms the signature (LSB-first). */
case class SimHash64(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash64 requires array<string>, got ${t.simpleString}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val votes = new Array[Long](64)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = HashSketches.hashUtf8(arr.getUTF8String(i),
          HashSketches.SparkHashSeed)
        var b = 0
        while (b < 64) {
          votes(b) += ((h >>> b) & 1L) * 2L - 1L
          b += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) sig |= 1L << b
      b += 1
    }
    sig
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** MinHash signature over a (distinct) shingle array: shingles are
  * string-hashed once; each of `numHashes` seeded functions takes the min
  * of a long re-hash. Empty arrays yield Long.MaxValue sentinels. */
case class MinHashSignature(child: Expression, numHashes: Int)
  extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig requires array<string>, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val shingleHashes = new Array[Long](n)
    var i = 0
    var m = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        shingleHashes(m) = HashSketches.hashUtf8(arr.getUTF8String(i),
          HashSketches.SparkHashSeed)
        m += 1
      }
      i += 1
    }
    val sig = new Array[Long](numHashes)
    var s = 0
    while (s < numHashes) {
      // xxhash64(seed, h): fold int seed then long h, starting at 42
      val seedH = XXH64.hashInt(s + 1, HashSketches.SparkHashSeed)
      var min = Long.MaxValue
      var j = 0
      while (j < m) {
        val h = XXH64.hashLong(shingleHashes(j), seedH)
        if (h < min) min = h
        j += 1
      }
      sig(s) = min
      s += 1
    }
    new GenericArrayData(sig)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

/** MinHash signature over PRE-HASHED elements (array<long>) — the
  * second phase of [[MinHashSignature]] without the string-hash step.
  * Lets any long-valued sketch (winnowing fingerprints, pre-hashed
  * shingles) be banded with the same seeded hash family. */
case class MinHashSignatureOfHashes(child: Expression, numHashes: Int)
  extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig_hashes requires array<long>, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig_hashes"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val sig = new Array[Long](numHashes)
    var s = 0
    while (s < numHashes) {
      val seedH = XXH64.hashInt(s + 1, HashSketches.SparkHashSeed)
      var min = Long.MaxValue
      var j = 0
      while (j < n) {
        if (!arr.isNullAt(j)) {
          val h = XXH64.hashLong(arr.getLong(j), seedH)
          if (h < min) min = h
        }
        j += 1
      }
      sig(s) = min
      s += 1
    }
    new GenericArrayData(sig)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSignatureOfHashes =
    copy(child = newChild)
}
