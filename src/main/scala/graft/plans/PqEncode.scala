package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/** Native product-quantization encoder: ARRAY<FLOAT> vector → ARRAY<INT>
  * of m codes, one fused loop over (subspace, centroid, dim) in
  * generated Java.
  *
  * This replaces the HOF formulation (per-centroid
  * `aggregate(zip_with(slice(...)))` folds) that hit BOTH documented
  * Spark perf cliffs at once: interpreted lambdas, and no CSE across
  * the m×ksub duplicated `slice` subtrees — plus the argmin's
  * `array_position(d, array_min(d))` evaluating the whole distance
  * array twice. Arithmetic is bit-identical to the HOF form (and the
  * DuckDB oracle): per (subspace, code), a sequential double fold of
  * (x−c)² in dimension order; argmin keeps the FIRST minimum (strict
  * `<`), i.e. ties break to the lowest code.
  *
  * Codebooks travel as a constructor value (Seq for structural
  * equality, flattened to a primitive float[] for eval/codegen) —
  * they're plan literals like the k-means centroids, broadcast with
  * the task binaries. Null element or short vector → null result
  * (the CosineSimilarity null discipline).
  */
case class PqEncode(child: Expression,
    codebooks: Seq[Seq[Seq[Float]]]) extends UnaryExpression {

  // shape validation up front: ksub/dsub derive from the FIRST
  // subspace while `flat` concatenates everything — a ragged codebook
  // would misindex centroid floats across subspaces (wrong codes, no
  // error) and an empty one would NPE below with no context
  require(codebooks.nonEmpty && codebooks.head.nonEmpty &&
    codebooks.head.head.nonEmpty, "codebooks must be non-empty")
  require(codebooks.forall(_.size == codebooks.head.size),
    "every subspace must have the same code count")
  require(codebooks.forall(_.forall(_.size == codebooks.head.head.size)),
    "every centroid must have the same sub-dimension")

  private val m: Int = codebooks.size
  private val ksub: Int = codebooks.head.size
  private val dsub: Int = codebooks.head.head.size

  @transient private lazy val flat: Array[Float] =
    codebooks.flatten.flatten.toArray

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_encode requires array<float>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def prettyName: String = "pq_encode"

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    if (v.numElements() < m * dsub) return null
    var i = 0
    while (i < m * dsub) {
      if (v.isNullAt(i)) return null
      i += 1
    }
    val codes = new Array[Int](m)
    var j = 0
    while (j < m) {
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < ksub) {
        var d = 0.0
        var p = 0
        while (p < dsub) {
          val diff = v.getFloat(j * dsub + p).toDouble -
            flat((j * ksub + c) * dsub + p).toDouble
          d += diff * diff
          p += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      codes(j) = best
      j += 1
    }
    new GenericArrayData(codes)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val cb = ctx.addReferenceObj("pqCodebooks", flat, "float[]")
    nullSafeCodeGen(ctx, ev, v => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val p = ctx.freshName("p")
      val d = ctx.freshName("d")
      val diff = ctx.freshName("diff")
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      val codes = ctx.freshName("codes")
      s"""
         |if ($v.numElements() < ${m * dsub}) { ${ev.isNull} = true; }
         |if (!${ev.isNull}) {
         |  for (int $i = 0; $i < ${m * dsub}; $i++) {
         |    if ($v.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  }
         |}
         |if (!${ev.isNull}) {
         |  final int[] $codes = new int[$m];
         |  for (int $j = 0; $j < $m; $j++) {
         |    int $best = 0;
         |    double $bestD = Double.MAX_VALUE;
         |    for (int $c = 0; $c < $ksub; $c++) {
         |      double $d = 0.0;
         |      for (int $p = 0; $p < $dsub; $p++) {
         |        final double $diff =
         |          (double) $v.getFloat($j * $dsub + $p)
         |            - (double) $cb[($j * $ksub + $c) * $dsub + $p];
         |        $d += $diff * $diff;
         |      }
         |      if ($d < $bestD) { $bestD = $d; $best = $c; }
         |    }
         |    $codes[$j] = $best;
         |  }
         |  ${ev.value} =
         |    new org.apache.spark.sql.catalyst.util.GenericArrayData($codes);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}
