package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunking (CDC) — gear-hash boundary detection in the
  * FastCDC family (Xia et al., USENIX ATC'16): a chunk boundary falls
  * where a rolling gear hash of the bytes since the chunk start has its
  * low `maskBits` bits zero, subject to [minSize, maxSize]. Because the
  * cut condition depends only on nearby CONTENT (not absolute offsets),
  * an insertion or deletion shifts boundaries only locally: chunks
  * before the edit are byte-identical, and boundaries re-synchronize
  * within ~one expected chunk after it. That is the property that makes
  * chunk-level dedup robust where fixed-size blocking is not.
  *
  * Gear table: splitmix64 of the byte value — deterministic, seedless,
  * engine-free. Boundary test starts only once a chunk reaches
  * `minSize` (the gear hash still accumulates from the chunk start);
  * a chunk is force-cut at `maxSize`; the final chunk may be shorter
  * than `minSize`. Expected chunk size ≈ minSize + 2^maskBits.
  *
  * Output: array<struct<start:int, len:int, hash:long>> in document
  * order — `start`/`len` are UTF-8 BYTE offsets (chunking is a byte
  * algorithm; pair with octet_length, not char length), `hash` is the
  * same wrapping polynomial over the chunk's bytes that
  * [[WinnowFingerprint]] uses, so equal hashes mean equal chunk
  * content up to 64-bit collision odds. Empty input yields [];
  * null-in/null-out.
  */
case class CdcChunks(child: Expression, minSize: Int, maskBits: Int,
    maxSize: Int) extends UnaryExpression with CodegenFallback {

  require(minSize > 0 && maxSize >= minSize,
    s"need 0 < minSize <= maxSize, got ($minSize, $maxSize)")
  require(maskBits >= 1 && maskBits <= 32, s"maskBits in [1,32]: $maskBits")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"cdc_chunks requires string, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("start", IntegerType, nullable = false),
    StructField("len", IntegerType, nullable = false),
    StructField("hash", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "cdc_chunks"

  private val mask = (1L << maskBits) - 1L
  private val B = RollingHash.B // SHARED base — cross-operator hash equality (see RollingHash)

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val n = bytes.length
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val gear = CdcChunks.Gear
    val out = new scala.collection.mutable.ArrayBuffer[Any](n / minSize + 1)
    var pos = 0
    while (pos < n) {
      val hardEnd = math.min(n, pos + maxSize)
      var cut = hardEnd
      var h = 0L
      var i = pos
      while (i < hardEnd && cut == hardEnd) {
        h = (h << 1) + gear(bytes(i) & 0xFF)
        i += 1
        if (i - pos >= minSize && (h & mask) == 0L) cut = i
      }
      var ch = 0L
      var j = pos
      while (j < cut) { ch = ch * B + (bytes(j) & 0xFF); j += 1 }
      out += InternalRow(pos, cut - pos, ch)
      pos = cut
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): CdcChunks =
    copy(child = newChild)
}

object CdcChunks {
  /** splitmix64(byte) — the standard finalizer chain, public domain. */
  private def splitmix64(seed: Long): Long = {
    var z = seed + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  private[plans] val Gear: Array[Long] =
    Array.tabulate(256)(b => splitmix64(b.toLong))
}
