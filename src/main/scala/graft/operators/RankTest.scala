package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mann-Whitney U (Wilcoxon rank-sum) test — the NONPARAMETRIC
  * two-sample test ([[AbTest.welchTTest]]'s robust sibling): does arm
  * B stochastically dominate arm A? Immune to the heavy tails and
  * outliers that wreck a means test on revenue/latency-shaped
  * metrics, which is exactly why experiment platforms keep both.
  *
  * Exactness: the whole statistic reduces over the DISTINCT-VALUE
  * frame — per quantized value, the two arm counts (ca, cb); then
  *   2·U_B = Σ_v cb·(2·cumA_<(v) + ca)     (pairwise wins ×2, ties ½)
  * is an exact integer (kept doubled so tie-halves stay integral),
  * and the tie correction Σ(t³−t) is an exact DECIMAL(38,0) sum
  * (t³ overflows a long past t ~ 2·10⁶ — a zero-inflated metric hits
  * that instantly). The normal approximation
  *   z = (2U_B − n_a·n_b) / (2·σ),
  *   σ² = (n_a·n_b/12)·((n+1) − Σ(t³−t)/(n(n−1)))
  * is one fixed-shape double chain, mirrored textually by the oracle.
  * No continuity correction (both engines would need the same branch;
  * at experiment n it moves z in the 4th decimal).
  *
  * Scale shape: one shuffle to the distinct-value frame, then the
  * cumulative arm counts come from a RANGE exchange + per-partition
  * running sums + a partition-count-sized driver prefix (the
  * SequentialIds/Skyline two-phase discipline) — no single-task
  * global window anywhere — and a 1-row reduce. Bounds: per-term
  * cb·2·cumA ≤ 2·maxTie·n must fit a long (~9·10¹⁸), i.e. fine to
  * ~3·10⁹ rows per arm even when one value holds a whole arm.
  */
object RankTest {

  /** One-row report: (n_a, n_b, u2_b, tie_cubed, z). `u2_b` = 2·U_B
    * (B's pairwise wins doubled), `tie_cubed` = Σ(t³−t) as a long
    * (exact to 9·10¹⁸). z is NULL when either arm is empty or every
    * row carries one value (zero variance). NULL variant/value rows
    * are excluded listwise; a fully empty (or fully NULL-filtered)
    * input returns one row of zero counts with z NULL. */
  def mannWhitney(df: DataFrame, variant: Column, value: Column,
      quantScale: Long = 100L): DataFrame = {
    require(quantScale > 0, "quantScale must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    val vals = df.filter(variant.isNotNull && value.isNotNull)
      .select(variant.as("_v"),
        round(value * quantScale).cast("long").as("q"))
      .groupBy("q").agg(
        sum(when(!col("_v"), 1L).otherwise(0L)).as("ca"),
        sum(when(col("_v"), 1L).otherwise(0L)).as("cb"))
    // two-phase exclusive prefix of ca over ascending q: pin the range
    // layout (the count pass and the numbering pass must see identical
    // boundaries), per-partition running sums, driver-side P-long fold
    val sorted = vals.repartitionByRange(col("q").asc)
      .withColumn("_pid", spark_partition_id())
      .localCheckpoint()
    val parts = sorted.groupBy("_pid").agg(sum(col("ca")).as("pa"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val offsets = parts.map(_._1)
      .zip(parts.map(_._2).scanLeft(0L)(_ + _)).toSeq
      .toDF("_pid", "_offa")
    val w = Window.partitionBy("_pid").orderBy(col("q").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val cum = sorted.join(broadcast(offsets), "_pid")
      .withColumn("cuma",
        col("_offa") + coalesce(sum(col("ca")).over(w), lit(0L)))
    // coalesce(..., 0): on a fully empty (or fully NULL-filtered)
    // input the sums are NULL — the report contract is zero counts
    // with z NULL (via the n_a > 0 guard), not NULL longs that throw
    // on read
    cum.agg(
        coalesce(sum(col("ca")), lit(0L)).cast("long").as("n_a"),
        coalesce(sum(col("cb")), lit(0L)).cast("long").as("n_b"),
        coalesce(sum(col("cb") * (lit(2L) * col("cuma") + col("ca"))),
          lit(0L)).cast("long").as("u2_b"),
        coalesce(sum((col("ca") + col("cb")).cast("decimal(12,0)")
          * (col("ca") + col("cb")).cast("decimal(12,0)")
          * (col("ca") + col("cb")).cast("decimal(12,0)")
          - (col("ca") + col("cb")).cast("decimal(12,0)")),
          lit(java.math.BigDecimal.ZERO)).cast("long").as("tie_cubed"))
      .select(col("n_a"), col("n_b"), col("u2_b"), col("tie_cubed"),
        expr(mannWhitneyZSql).as("z"))
  }

  /** Two-sample Kolmogorov–Smirnov test — the DISTRIBUTION-shape
    * sibling of [[mannWhitney]] (which only sees stochastic
    * dominance): D = max_v |F_A(v) − F_B(v)| over the pooled support,
    * sensitive to any difference (location, spread, shape). The exact
    * drift test between two metric snapshots — q53's PSI needs binning
    * choices; KS needs none.
    *
    * Exactness: D's numerator is the exact integer
    *   d_num = max_v |cumA(v)·n_b − cumB(v)·n_a|
    * (inclusive cumulative arm counts over the distinct-value frame,
    * cross-multiplied to clear the denominators; DECIMAL(38,0) inside,
    * long out — fine to n_a·n_b ≤ 9·10¹⁸, i.e. ~3·10⁹ rows per arm),
    * and D = d_num/(n_a·n_b) exactly. d_ppm is its ppm floor-division;
    * the asymptotic λ = D·√(n_a·n_b/(n_a+n_b)) is one fixed double
    * chain (round 4). No p-value: it needs exp(), whose libm rounding
    * is not pinned cross-engine — callers compare λ to the standard
    * quantiles (1.358 at α=.05, 1.628 at α=.01).
    *
    * Scale shape: [[mannWhitney]]'s exactly — one shuffle to the
    * distinct-value frame, a RANGE exchange + per-partition running
    * sums + a partition-count driver prefix (both arms this time),
    * and a 1-row max reduce. */
  def ksTest(df: DataFrame, variant: Column, value: Column,
      quantScale: Long = 100L): DataFrame = {
    require(quantScale > 0, "quantScale must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    val vals = df.filter(variant.isNotNull && value.isNotNull)
      .select(variant.as("_v"),
        round(value * quantScale).cast("long").as("q"))
      .groupBy("q").agg(
        sum(when(!col("_v"), 1L).otherwise(0L)).as("ca"),
        sum(when(col("_v"), 1L).otherwise(0L)).as("cb"))
    val sorted = vals.repartitionByRange(col("q").asc)
      .withColumn("_pid", spark_partition_id())
      .localCheckpoint()
    val parts = sorted.groupBy("_pid")
      .agg(sum(col("ca")).as("pa"), sum(col("cb")).as("pb"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    val na = parts.map(_._2).sum
    val nb = parts.map(_._3).sum
    val offsets = parts.map(_._1)
      .lazyZip(parts.map(_._2).scanLeft(0L)(_ + _))
      .lazyZip(parts.map(_._3).scanLeft(0L)(_ + _))
      .toSeq.toDF("_pid", "_offa", "_offb")
    // INCLUSIVE running sums this time: F(v) counts values <= v
    val w = Window.partitionBy("_pid").orderBy(col("q").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val cum = sorted.join(broadcast(offsets), "_pid")
      .select(abs(dec(col("_offa") + sum(col("ca")).over(w)) * nb -
        dec(col("_offb") + sum(col("cb")).over(w)) * na).as("term"))
    cum.agg(coalesce(max(col("term")), lit(java.math.BigDecimal.ZERO))
        .cast("long").as("d_num"))
      .select(lit(na).as("n_a"), lit(nb).as("n_b"), col("d_num"))
      .select(col("n_a"), col("n_b"), col("d_num"),
        expr(ksPpmSql).as("d_ppm"), expr(ksLambdaSql).as("lambda"))
  }

  // KS's shared expression text over (n_a, n_b, d_num); the oracle
  // replays the ppm floor-division with `//` on HUGEINT (f10 class)
  private[graft] def ksPpmSql: String =
    "CASE WHEN n_a > 0 AND n_b > 0 THEN " +
      "CAST(CAST(1000000 AS DECIMAL(38,0)) * d_num div " +
      "(CAST(n_a AS DECIMAL(38,0)) * n_b) AS BIGINT) END"

  /** λ = D·√(n_a·n_b/(n_a+n_b)) over the exact integers, rounded 4. */
  private[graft] def ksLambdaSql: String =
    s"CASE WHEN n_a > 0 AND n_b > 0 THEN " +
      s"round((${d("d_num")} / (${d("n_a")} * ${d("n_b")})) * " +
      s"sqrt(${d("n_a")} * ${d("n_b")} / ($nD)), 4) END"

  /** ROC-AUC as the rescaled rank-sum — AUC = U⁺/(n⁻·n⁺), the exact
    * probability (ties ½) that a random positive outscores a random
    * negative (Hanley & McNeil 1982; identical machinery to
    * [[mannWhitney]], which is WHY it's here: one distinct-value
    * reduce serves both the test and the classifier eval). One-row
    * report (n_neg, n_pos, u2_pos, auc_ppm, gini_ppm), exact integer
    * ppm: auc_ppm = 1e6·u2_pos div (2·n⁻·n⁺) in DECIMAL(38,0)
    * (u2_pos ≈ 2n⁻n⁺ overflows a long×1e6 past ~10⁵ rows per class),
    * gini = 2·AUC − 1 rescaled. NULL ppm when either class is empty.
    * Same scale shape as [[mannWhitney]]: one shuffle to the
    * distinct-score frame, a two-phase prefix, a 1-row reduce. */
  def rocAuc(df: DataFrame, label: Column, score: Column,
      quantScale: Long = 100L): DataFrame =
    mannWhitney(df, label, score, quantScale)
      .select(col("n_a").as("n_neg"), col("n_b").as("n_pos"),
        col("u2_b").as("u2_pos"),
        expr(aucPpmSql).as("auc_ppm"),
        expr(s"CASE WHEN $aucPpmSql IS NOT NULL THEN " +
          s"2 * ($aucPpmSql) - 1000000 END").as("gini_ppm"))

  // auc's expression text over the mannWhitney report columns; the
  // oracle replays the same floor-division with DuckDB's `//` (the
  // f10/TargetEncode ppm discipline — exact integers either way)
  private[graft] def aucPpmSql: String =
    "CASE WHEN n_a > 0 AND n_b > 0 THEN " +
      "CAST(CAST(1000000 AS DECIMAL(38,0)) * u2_b div " +
      "(CAST(n_a AS DECIMAL(38,0)) * n_b * 2) AS BIGINT) END"

  // z's expression text, shared verbatim with the oracle (over the
  // integer columns n_a, n_b, u2_b, tie_cubed)
  private def d(x: String) = s"CAST($x AS DOUBLE)"
  private def nD = d("n_a + n_b")
  private def varU =
    s"((${d("n_a")} * ${d("n_b")} / 12.0) * " +
      s"(($nD + 1.0) - ${d("tie_cubed")} / ($nD * ($nD - 1.0))))"

  /** Normal-approximation z over the report's integer columns. */
  private[graft] def mannWhitneyZSql: String =
    s"CASE WHEN n_a > 0 AND n_b > 0 AND $varU > 0.0 THEN " +
      s"round((${d("u2_b")} - ${d("n_a")} * ${d("n_b")}) / " +
      s"(2.0 * sqrt($varU)), 4) END"
}
