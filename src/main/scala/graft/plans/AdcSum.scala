package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Native ADC lookup-sum: ARRAY<INT> of m PQ codes → DOUBLE asymmetric
  * distance Σ_j lut(j)(codes(j)), one fused loop in generated Java over
  * the broadcast m×ksub query→centroid distance table.
  *
  * This is [[PqEncode]]'s readout sibling, replacing the HOF
  * formulation `aggregate(zip_with(codes, sequence(1, m),
  * element_at(element_at(lut, j), c + 1)), 0.0, +)` that hit the same
  * two documented Spark perf cliffs the encoder did: interpreted
  * lambdas (no codegen), and the LUT literal plus lambda subtrees
  * re-derived per reference site (no CSE) — measured as the repo's two
  * worst same-work multiples (s15 25×, s07 4.9× vs the oracle engine)
  * before going native. Arithmetic is bit-identical to the HOF form
  * and the DuckDB oracle: a sequential double fold in subspace order
  * j = 0..m−1.
  *
  * The LUT travels as a constructor value (Seq-of-Seq for structural
  * equality, flattened to a primitive double[] for eval/codegen) — a
  * plan literal broadcast with the task binaries like the PqEncode
  * codebooks, so the scan reads m ints per row and joins nothing.
  *
  * Null discipline (the [[CosineSimilarity]] contract): short array or
  * null element → null. An out-of-range code also yields null rather
  * than the ANSI `element_at` error the HOF form threw — codes come
  * from [[PqEncode]] (always in range); a corrupt persisted codes
  * table should drop from the shortlist, not kill the query 40 stages
  * in. Callers already filter null distances before ranking.
  */
case class AdcSum(child: Expression,
    lut: Seq[Seq[Double]]) extends UnaryExpression {

  require(lut.nonEmpty && lut.head.nonEmpty, "lut must be non-empty")
  require(lut.forall(_.size == lut.head.size),
    "every subspace row must have the same code count")

  private val m: Int = lut.size
  private val ksub: Int = lut.head.size

  @transient private lazy val flat: Array[Double] = lut.flatten.toArray

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"adc_sum requires array<int>, got ${other.simpleString}")
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "adc_sum"

  override def nullSafeEval(input: Any): Any = {
    val codes = input.asInstanceOf[ArrayData]
    if (codes.numElements() < m) return null
    var d = 0.0
    var j = 0
    while (j < m) {
      if (codes.isNullAt(j)) return null
      val c = codes.getInt(j)
      if (c < 0 || c >= ksub) return null
      d += flat(j * ksub + c)
      j += 1
    }
    java.lang.Double.valueOf(d)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val tbl = ctx.addReferenceObj("adcLut", flat, "double[]")
    nullSafeCodeGen(ctx, ev, codes => {
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val d = ctx.freshName("d")
      s"""
         |if ($codes.numElements() < $m) { ${ev.isNull} = true; }
         |if (!${ev.isNull}) {
         |  double $d = 0.0;
         |  for (int $j = 0; $j < $m; $j++) {
         |    if ($codes.isNullAt($j)) { ${ev.isNull} = true; break; }
         |    final int $c = $codes.getInt($j);
         |    if ($c < 0 || $c >= $ksub) { ${ev.isNull} = true; break; }
         |    $d += $tbl[$j * $ksub + $c];
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $d; }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): AdcSum =
    copy(child = newChild)
}
