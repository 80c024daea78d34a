package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Two-sample proportion z-test — the experiment-analysis primitive
  * every event pipeline ends in: did variant B convert better than
  * variant A, and is the difference bigger than noise? (The classic
  * pooled two-proportion z; |z| > 1.96 ⟺ p < 0.05 two-sided.)
  *
  * Exactness: the inputs to the test are four INTEGER counts from one
  * aggregate; rates are ppm floor-division integers; the z statistic
  * is one fixed-shape double expression over those integers (divide,
  * multiply, sqrt — IEEE-identical in any engine), rounded to 4. So
  * the whole report replays bit-for-bit, unlike a float-sum path.
  *
  * Scale shape: ONE conditional-sum aggregate over the user-level
  * frame (map-side combined, 1-row result). Deriving the user-level
  * frame from events is the caller's one groupBy(user) — the gate
  * shows the composition.
  */
object AbTest {

  /** One-row report from a USER-LEVEL frame: `variant` boolean column
    * (false = A/control, true = B/treatment), `converted` boolean
    * column. Output: (n_a, conv_a, rate_a_ppm, n_b, conv_b,
    * rate_b_ppm, lift_ppm, z). `lift_ppm` = rate_b − rate_a in ppm
    * (signed). NULL variant rows are excluded (no arm); NULL converted
    * counts as not converted. z is NULL when either arm is empty or
    * the pooled rate is degenerate (0 or 1 — no variance, no test). */
  def proportionTest(users: DataFrame, variant: Column,
      converted: Column): DataFrame = {
    val agg = users.filter(variant.isNotNull)
      .agg(
        sum(when(!variant, 1L).otherwise(0L)).as("n_a"),
        sum(when(!variant && coalesce(converted, lit(false)), 1L)
          .otherwise(0L)).as("conv_a"),
        sum(when(variant, 1L).otherwise(0L)).as("n_b"),
        sum(when(variant && coalesce(converted, lit(false)), 1L)
          .otherwise(0L)).as("conv_b"))
    // fixed-shape double chain, mirrored textually in the oracle:
    // p̂ = pooled rate, z = (pb − pa) / sqrt(p̂(1−p̂)(1/na + 1/nb))
    // empty-arm guard on every division: ANSI mode makes `div 0` an
    // ERROR, not a NULL — an experiment with an unpopulated arm must
    // report NULL rates/lift, not crash the job
    val rateA = expr(
      "CASE WHEN n_a > 0 THEN (1000000 * conv_a) div n_a END")
    val rateB = expr(
      "CASE WHEN n_b > 0 THEN (1000000 * conv_b) div n_b END")
    agg.select(
      col("n_a"), col("conv_a"), rateA.as("rate_a_ppm"),
      col("n_b"), col("conv_b"), rateB.as("rate_b_ppm"),
      (rateB - rateA).as("lift_ppm"),
      round(expr(
        "CASE WHEN n_a > 0 AND n_b > 0 " +
          "AND conv_a + conv_b > 0 AND conv_a + conv_b < n_a + n_b " +
          "THEN (CAST(conv_b AS DOUBLE) / n_b - " +
          "CAST(conv_a AS DOUBLE) / n_a) / " +
          "sqrt((CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b)) * " +
          "(1.0 - CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b)) * " +
          "(1.0 / n_a + 1.0 / n_b)) " +
          "ELSE NULL END"), 4).as("z"))
  }

  private val K: Long = 1000000000L // hi/lo split base (Stats recipe)

  /** Welch's two-sample t-test on MEANS — [[proportionTest]]'s
    * continuous-metric sibling (revenue per user, latency, tokens per
    * doc), with no equal-variance assumption (the unpooled form is the
    * safe default; Welch 1947, Satterthwaite 1946 df).
    *
    * Exactness: the moments feeding the test are EXACT ORDER-FREE long
    * sums over `round(value · quantScale)` integers — squares hi/lo
    * split per term so partial aggregation and shuffle order cannot
    * move an ulp (the Stats.corrMatrix recipe; decimal sums at this
    * precision would leave the compact-Long path, measured 25×). The
    * t statistic and Satterthwaite df are one fixed-shape double chain
    * over those integers, mirrored textually by the oracle.
    *
    * Bounds (the Stats contract): |value·quantScale| ≤ ~3·10⁹ per row
    * (ANSI errors loudly past that), lo-sums safe to ~9 billion rows
    * at the default split base.
    *
    * Scale shape: ONE conditional-sum aggregate (map-side combined,
    * 1-row result) — no per-arm scan, no variance second pass.
    *
    * Output: (n_a, n_b, mean_a, mean_b, t_stat, df), means in original
    * units, everything rounded to 4. NULL variant/value rows are
    * excluded (no arm / no measurement — listwise, matching the
    * oracle's WHERE). t/df are NULL when either arm has < 2 rows or
    * both arms are constant (zero standard error — no test). */
  def welchTTest(df: DataFrame, variant: Column, value: Column,
      quantScale: Long = 100L): DataFrame = {
    require(quantScale > 0, "quantScale must be positive")
    val base = df.filter(variant.isNotNull && value.isNotNull)
      .select(variant.as("_v"),
        round(value * quantScale).cast("long").as("q"))
    // integer stage: exact conditional long sums; hi = exact integer
    // quotient of (p − pmod(p, K)), a multiple of K (see Stats)
    def armSums(arm: String, pred: String) = Seq(
      expr(s"sum(CASE WHEN $pred THEN 1L ELSE 0L END)").as(s"n_$arm"),
      expr(s"sum(CASE WHEN $pred THEN q ELSE 0L END)").as(s"s_$arm"),
      expr(s"sum(CASE WHEN $pred THEN ((q * q) - pmod(q * q, ${K}L)) " +
        s"div ${K}L ELSE 0L END)").as(s"ss_${arm}_hi"),
      expr(s"sum(CASE WHEN $pred THEN pmod(q * q, ${K}L) ELSE 0L END)")
        .as(s"ss_${arm}_lo"))
    val sums = armSums("a", "NOT _v") ++ armSums("b", "_v")
    val m = base.agg(sums.head, sums.tail: _*)
    val staged = m.select(col("n_a"), col("n_b"), col("s_a"), col("s_b"),
      expr(welchVarSql("a")).as("va"), expr(welchVarSql("b")).as("vb"))
    staged.select(col("n_a"), col("n_b"),
      expr(welchMeanSql("a", quantScale)).as("mean_a"),
      expr(welchMeanSql("b", quantScale)).as("mean_b"),
      expr(welchTSql).as("t_stat"), expr(welchDfSql).as("df"))
  }

  // The double-stage expression TEXT, shared verbatim with the DuckDB
  // oracle (AnalyticsQueries f15) so the fixed-shape IEEE chains cannot
  // drift between engines. All are ANSI SQL over the integer columns
  // n_a/n_b/s_a/s_b (+ ss_*_hi/lo for the variances; t/df read the
  // staged va/vb).
  private def d(x: String) = s"CAST($x AS DOUBLE)"

  /** Sample variance of one arm in quant units² (NULL below 2 rows). */
  private[graft] def welchVarSql(arm: String): String = {
    val rec = s"(${d(s"ss_${arm}_hi")} * $K + ${d(s"ss_${arm}_lo")})"
    s"CASE WHEN n_$arm > 1 THEN (${d(s"n_$arm")} * $rec - " +
      s"${d(s"s_$arm")} * ${d(s"s_$arm")}) / " +
      s"(${d(s"n_$arm")} * (${d(s"n_$arm")} - 1.0)) END"
  }

  /** Arm mean in original units, rounded to 4. */
  private[graft] def welchMeanSql(arm: String, quantScale: Long): String =
    s"CASE WHEN n_$arm > 0 THEN round(${d(s"s_$arm")} / " +
      s"${d(s"n_$arm")} / $quantScale.0, 4) END"

  private def sea = s"(va / ${d("n_a")})"
  private def seb = s"(vb / ${d("n_b")})"
  private def se2 = s"($sea + $seb)"
  private def tested = s"va IS NOT NULL AND vb IS NOT NULL AND $se2 > 0.0"

  /** Welch t statistic (B − A), rounded to 4. */
  private[graft] def welchTSql: String =
    s"CASE WHEN $tested THEN " +
      s"round((${d("s_b")} / ${d("n_b")} - ${d("s_a")} / ${d("n_a")}) " +
      s"/ sqrt($se2), 4) END"

  /** Welch–Satterthwaite degrees of freedom, rounded to 4. */
  private[graft] def welchDfSql: String =
    s"CASE WHEN $tested THEN round(($se2 * $se2) / " +
      s"(($sea * $sea) / (${d("n_a")} - 1.0) + " +
      s"($seb * $seb) / (${d("n_b")} - 1.0)), 4) END"

  private[graft] def splitBase: Long = K
}
