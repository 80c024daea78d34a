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
}
