package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Probability-calibration report (reliability diagram + expected
  * calibration error; Naeini et al. AAAI'15 style binning) — the eval
  * that tells you whether a scorer's 0.8 MEANS 80%: bucket predictions
  * into fixed-width probability bins, compare each bin's mean
  * predicted probability against its observed positive rate, and roll
  * the population-weighted gap up into ECE. [[RankTest.rocAuc]] ranks;
  * this checks the probabilities themselves — a model can post a
  * perfect AUC and still be badly calibrated.
  *
  * Exactness: predictions quantize once to ppm longs (`round(p·1e6)`,
  * clamped to [0, 1e6]); bins are integer floor-divisions of the ppm
  * value; per-bin pred/obs are ppm floor-divisions of exact sums
  * (Σp_ppm in DECIMAL(38,0) — 10¹² rows of 10⁶-ppm overflow a long);
  * ECE is the floor-division of Σ n_bin·|obs−pred| by N. Everything
  * replays bit-for-bit in any engine. Bounds: obs_ppm's 1e6·pos
  * numerator is a long — fine to ~9·10¹² positives per bin (ANSI
  * errors loudly past that, the AbTest discipline).
  *
  * Scale shape: ONE map-side-combinable aggregate to the bins-sized
  * frame; the ECE rider is a 1-row crossJoin back onto it. Nothing
  * downstream of the first shuffle scales with n.
  */
object Calibration {

  /** Per-bin report (bin, n, pos, pred_ppm, obs_ppm, gap_ppm,
    * ece_ppm) for `p` in [0, 1] (values outside clamp to the edge
    * bins — an out-of-range score is still a prediction, the Drift
    * clamp rationale) against boolean `label`. Only non-empty bins
    * appear (a bin with no predictions has no calibration to report);
    * `ece_ppm` repeats on every row (the 1-row rider discipline).
    * NULL label/score rows are excluded listwise. NaN scores are the
    * caller's to filter: they are not NULL, and engines disagree on
    * NaN→integer casts (the KmvSketch /0 lesson) — a probability
    * column containing NaN is already a broken scorer upstream. */
  def report(df: DataFrame, label: Column, p: Column,
      bins: Int = 10): DataFrame = {
    require(bins >= 2, "bins must be >= 2")
    val base = df.filter(label.isNotNull && p.isNotNull)
      .select(label.as("_y"),
        least(greatest(round(p * 1000000L).cast("long"), lit(0L)),
          lit(1000000L)).as("pq"))
      // p = 1.0 lands in the top bin, not a phantom bin `bins`
      .withColumn("bin",
        least(expr(s"(pq * $bins) div 1000000"), lit(bins - 1)))
    // bins-sized; materialized so the ECE rider reads it instead of
    // lazily re-running the corpus aggregate (the q51 re-derive cliff)
    val perBin = base.groupBy("bin").agg(
        count(lit(1)).as("n"),
        sum(when(col("_y"), 1L).otherwise(0L)).as("pos"),
        sum(col("pq").cast("decimal(38,0)")).as("_sp"))
      .select(col("bin"), col("n"), col("pos"),
        expr("CAST(_sp div n AS BIGINT)").as("pred_ppm"),
        expr("(1000000 * pos) div n").as("obs_ppm"))
      .withColumn("gap_ppm", abs(col("obs_ppm") - col("pred_ppm")))
      .localCheckpoint()
    val ece = perBin.agg(
      expr("CAST(sum(CAST(n AS DECIMAL(38,0)) * gap_ppm) div sum(n) " +
        "AS BIGINT)").as("ece_ppm"))
    perBin.crossJoin(broadcast(ece)).orderBy("bin")
  }
}
