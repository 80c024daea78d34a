package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native random-hyperplane LSH bucketing: one long bucket id per table,
  * bit p set iff the vector's dot product with plane p is >= 0.
  *
  * The HOF form (VectorOps.hyperplaneSignaturesHof) evaluates
  * tables×planes separate interpreted aggregate/zip_with chains per row —
  * with no common-subexpression elimination inside lambdas that is
  * 72 allocation-heavy passes for the 12×6 default. This expression does
  * the same arithmetic (sequential double fold per plane, ascending
  * index — bit-identical, spec-enforced) in one tight JVM loop.
  * CodegenFallback is fine: the cost was per-element lambda dispatch,
  * not per-row dispatch.
  *
  * `planes` is the flattened [table][plane][dim] matrix, generated
  * driver-side from the seed and shipped as part of the expression
  * (tables×planes×dim doubles — tiny, identical on every executor).
  */
case class HyperplaneBuckets(child: Expression, planes: Seq[Double],
    tables: Int, planesPerTable: Int, dim: Int)
  extends UnaryExpression with CodegenFallback {

  require(planes.length == tables * planesPerTable * dim,
    s"planes length ${planes.length} != $tables*$planesPerTable*$dim")
  // bucket bits pack into ONE long per table: 1L << p wraps mod 64, so
  // planes 64+ would silently alias onto planes 0+ (bucket collisions,
  // no error) — bound it here like the caller-facing knobs elsewhere
  require(planesPerTable >= 1 && planesPerTable <= 63,
    s"planesPerTable $planesPerTable outside [1, 63] (bits of one long)")

  // Seq field keeps Catalyst STRUCTURAL equality (an Array field
  // compares by reference, so two identical bucket expressions would
  // never CSE/reuse — the PqEncode discipline); the eval loop reads
  // the unboxed copy
  @transient private lazy val flat: Array[Double] = planes.toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"hyperplane_buckets requires array<float>, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hyperplane_buckets"

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    // Mirror the HOF reference exactly on degenerate inputs: zip_with
    // pads a length mismatch with null, and any null element nulls the
    // whole dot product, whose `when(_ >= 0)` then falls to the
    // otherwise(0L) bit — i.e. an incomplete vector gets the all-zero
    // bucket in every table. getFloat on a null slot would instead read
    // an undefined value and silently diverge from the documented
    // bit-identical guarantee (r2 advisor item).
    val m = v.numElements()
    var complete = m == dim
    var j0 = 0
    while (complete && j0 < m) {
      if (v.isNullAt(j0)) complete = false
      j0 += 1
    }
    if (!complete) return new GenericArrayData(new Array[Long](tables))
    val n = dim
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var bucket = 0L
      var p = 0
      while (p < planesPerTable) {
        val base = (t * planesPerTable + p) * dim
        var s = 0.0
        var j = 0
        while (j < n) {
          s += v.getFloat(j).toDouble * flat(base + j)
          j += 1
        }
        if (s >= 0) bucket |= 1L << p
        p += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBuckets =
    copy(child = newChild)
}
