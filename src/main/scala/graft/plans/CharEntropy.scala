package graft.plans

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

/** Per-document Shannon character entropy in ONE pass per row — the
  * classic "random bytes / mojibake / binary-in-text" quality signal a
  * corpus-curation pipeline runs next to Gopher rules (t19) and
  * repetition (t08).
  *
  * Why an Expression and not `explode(chars)` + two aggregations: the
  * relational form shuffles one row PER CHARACTER (a 100 TB corpus is
  * ~10^14 char rows — the shuffle would dwarf the scan), while this is a
  * scan-side projection whose output is 3 scalars per document. The
  * DuckDB oracle (TextQueries t24) runs the relational unnest form, so
  * the gate cross-checks the two shapes.
  *
  * Exactness contract with the oracle: per distinct code point,
  * `term = p * ln(p)` (`p = k/n`, IEEE double ops identical in both
  * engines), then each term is quantized to DECIMAL(28,14) exactly as
  * Spark's `Cast(double→decimal)` does (`BigDecimal.valueOf` +
  * `setScale(14, HALF_UP)` — the t12/t16 recipe) and summed EXACTLY, so
  * the total is independent of iteration order and matches DuckDB's
  * `sum(CAST(term AS DECIMAL(28,14)))` bit-for-bit before the final
  * round.
  *
  * Output: struct(n_chars long, n_distinct long, entropy double) — counts
  * are over Unicode code points (DuckDB's `string_split(text, '')` /
  * `length()` semantics), entropy in nats. Empty input → (0, 0, 0.0).
  */
case class CharEntropyStats(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"char_entropy_stats requires string, got ${t.simpleString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("n_chars", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("entropy", DoubleType, nullable = false)))

  override def prettyName: String = "char_entropy_stats"

  override def nullSafeEval(input: Any): Any = {
    val s = input.toString
    val counts = new java.util.HashMap[Integer, Array[Int]]()
    var n = 0L
    var i = 0
    val len = s.length
    while (i < len) {
      val cp = s.codePointAt(i)
      val slot = counts.get(cp)
      if (slot == null) counts.put(cp, Array(1)) else slot(0) += 1
      n += 1L
      i += Character.charCount(cp)
    }
    var entropy = 0.0
    if (n > 0L) {
      var acc = JBigDecimal.ZERO
      val it = counts.values().iterator()
      while (it.hasNext) {
        val k = it.next()(0)
        val p = k.toDouble / n.toDouble
        val term = p * math.log(p)
        acc = acc.add(
          JBigDecimal.valueOf(term).setScale(14, RoundingMode.HALF_UP))
      }
      // signum guard: an all-zero term sum must render 0.0, not -0.0
      entropy = if (acc.signum() == 0) 0.0 else -acc.doubleValue()
    }
    InternalRow(n, counts.size().toLong, entropy)
  }

  override protected def withNewChildInternal(
      newChild: Expression): CharEntropyStats = copy(child = newChild)
}
