package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pearson χ² test of independence over a contingency table — "is
  * this categorical column independent of that one?" (is lang mix
  * stable across sources? does quality tier depend on domain?) — with
  * Cramér's V as the effect size, the pre-mixture audit every corpus
  * rebalance wants.
  *
  * Exactness: observed counts are integers from ONE (r, c) groupBy;
  * each cell's (o−e)²/e term and its expected value e are quantized
  * to DECIMAL(28,14) before the sum (the t12/f13 recipe — float sums
  * don't commute, decimal sums do), so the statistic replays
  * bit-for-bit in any engine. Zero-observed cells (never grouped)
  * contribute exactly their expected value to χ², folded in through
  * the identity Σ_all e = n:
  *   χ² = Σ_obs (o−e)²/e + (n − Σ_obs e)
  * so the full R×C grid never materializes. The correction is clamped
  * at 0 (a full grid makes it −ε at the 14th decimal, and sqrt must
  * not see a negative).
  *
  * Term bound: each term ≤ n, so DECIMAL(28,14)'s 14 integer digits
  * hold to ~10¹⁴ rows; the sums widen to (38,14) in both engines.
  *
  * Scale shape: one corpus shuffle on (r, c); everything after is
  * cells-sized (row/col totals re-aggregate the CELL frame, not the
  * corpus) ending in a 1-row report. NULL categories form their own
  * level, like the groupBy they came from.
  */
object Contingency {

  /** One-row report: (n, r_levels, c_levels, dof, chi2, cramers_v).
    * chi2 rounded to 4; cramers_v NULL when either side has a single
    * level (no test). */
  def chiSquare(df: DataFrame, rowCol: String, colCol: String): DataFrame = {
    // cells-sized; read by row totals, col totals, n, and the term join
    val cells = df.groupBy(col(rowCol).as("r"), col(colCol).as("c"))
      .agg(count(lit(1)).as("o")).localCheckpoint()
    val rt = cells.groupBy("r").agg(sum(col("o")).as("rt"))
    val ct = cells.groupBy("c").agg(sum(col("o")).as("ct"))
    val stats = cells.agg(sum(col("o")).cast("long").as("n"))
      .crossJoin(broadcast(rt.agg(count(lit(1)).as("r_levels"))))
      .crossJoin(broadcast(ct.agg(count(lit(1)).as("c_levels"))))
    // NULL-SAFE total joins: a NULL category is a real level, and a
    // plain equi-join would drop its cells here — the terms would then
    // land in the zero-cell correction as if unobserved (caught by the
    // NULL-level spec: chi2 read 20.0 instead of 0.0)
    val sums = cells
      .join(rt.withColumnRenamed("r", "_r"), col("r") <=> col("_r"))
      .join(ct.withColumnRenamed("c", "_c"), col("c") <=> col("_c"))
      .crossJoin(broadcast(stats))
      .agg(expr(s"sum(CAST($chiTermSql AS DECIMAL(28,14)))").as("t_sum"),
        expr(s"sum(CAST($expectedSql AS DECIMAL(28,14)))").as("e_sum"))
    sums.crossJoin(broadcast(stats))
      .select(col("n"), col("r_levels"), col("c_levels"),
        ((col("r_levels") - 1) * (col("c_levels") - 1)).as("dof"),
        expr(s"round($chi2Sql, 4)").as("chi2"),
        expr(cramersVSql).as("cramers_v"))
  }

  // Expression TEXT shared verbatim with the DuckDB oracle (the AbTest
  // discipline) — the IEEE chains cannot drift between engines.
  private def d(x: String) = s"CAST($x AS DOUBLE)"

  /** Expected cell count e = rt·ct/n (over columns rt, ct, n). */
  private[graft] def expectedSql: String =
    s"((${d("rt")} * ${d("ct")}) / ${d("n")})"

  /** One observed cell's χ² term (o−e)²/e (over columns o, rt, ct, n). */
  private[graft] def chiTermSql: String =
    s"(((${d("o")} - $expectedSql) * (${d("o")} - $expectedSql)) / " +
      s"$expectedSql)"

  /** χ² from the two decimal sums + the zero-cell correction, clamped
    * at 0 (over columns t_sum, e_sum, n). */
  private[graft] def chi2Sql: String =
    s"(${d("t_sum")} + greatest(${d("n")} - ${d("e_sum")}, 0.0))"

  /** Cramér's V = sqrt(χ² / (n·(min(R,C)−1))), NULL without ≥2 levels
    * per side (over columns t_sum, e_sum, n, r_levels, c_levels). */
  private[graft] def cramersVSql: String =
    s"CASE WHEN n > 0 AND least(r_levels, c_levels) > 1 THEN " +
      s"round(sqrt($chi2Sql / (${d("n")} * " +
      s"${d("least(r_levels, c_levels) - 1")})), 4) END"
}
