package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Robust per-group outlier detection: median / MAD (median absolute
  * deviation) with the Hampel rule `|x − med| > k·MAD` (Hampel 1974;
  * Leys et al. 2013). Mean/stddev outlier rules break down exactly
  * when outliers exist (the outliers inflate the stddev that is
  * supposed to catch them); median/MAD have a 50% breakdown point —
  * this is the quality-filter shape a curation pipeline wants for
  * "drop documents with absurd length for their source" style rules.
  *
  * Exactness: medians are LOWER medians — the element at rank
  * ⌈n/2⌉ of the sorted group, always an actual data value — computed
  * on cent-scaled BIGINTs. No interpolation, no floats: the flag
  * comparison is pure integer arithmetic (`|x−med| > k·MAD`), so the
  * outlier set replays bit-for-bit in any engine.
  *
  * Scale: two window passes over the same `PARTITION BY group`
  * layout (one Exchange) plus a broadcast-back of the group-sized
  * (med, mad) frame. Fine when groups fit a partition (the common
  * case: group = source/domain/month). For a GLOBAL robust rule or
  * giant groups, swap the rank windows for [[ExactSelection]]'s
  * histogram bisection — same lower-median contract, no sort.
  */
object RobustStats {

  /** Per-group lower median of `valueCol` (BIGINT-exact). Returns
    * (group, med). */
  private def groupMedian(df: DataFrame, group: String, valueCol: String,
      out: String): DataFrame = {
    val w = Window.partitionBy(group).orderBy(col(valueCol))
    df.select(col(group), col(valueCol))
      .withColumn("_rn", row_number().over(w))
      .withColumn("_n", count(lit(1)).over(Window.partitionBy(group)))
      .filter(col("_rn") === expr("(_n + 1) div 2")) // ceil(n/2), int math
      .select(col(group), col(valueCol).as(out))
  }

  /** Flag rows where `|value − med(group)| > k · MAD(group)`.
    * `valueCol` must be integral (scale money to cents upstream).
    * Returns the input plus (med, mad, is_outlier). */
  def madOutliers(df: DataFrame, group: String, valueCol: String,
      k: Int): DataFrame = {
    val med = groupMedian(df, group, valueCol, "med")
    val withMed = df.join(med, group)
    val mad = groupMedian(
      withMed.withColumn("_adev", abs(col(valueCol) - col("med"))),
      group, "_adev", "mad")
    withMed.join(mad, group)
      .withColumn("is_outlier",
        abs(col(valueCol) - col("med")) > lit(k.toLong) * col("mad"))
  }

  /** Per-group WEIGHTED (lower) median: the smallest value whose
    * cumulative weight reaches half the group's total —
    * `min{v : 2·Σ_{x≤v} w(x) ≥ W}`. Weights must be non-negative
    * (enforced — a negative weight raises rather than silently
    * selecting below any sensible median) and are integer-exact (floor
    * the weight column), the cumulative window uses RANGE framing
    * (peers included), so duplicate values select deterministically in
    * any engine regardless of tie order, and the returned median is a
    * DATA value — no arithmetic to drift. Returns
    * (group, tot_weight, wmedian).
    *
    * Scale note: exact weighted order statistics are sort-based by
    * contract (parallelism = #groups); q43's mergeable histogram
    * sketch is the scale path when an ε-approximation suffices. */
  def weightedMedian(df: DataFrame, group: String, valueCol: String,
      weightCol: String): DataFrame = {
    val byG = Window.partitionBy(group)
    val cum = df.select(col(group),
        col(valueCol).as("_v"),
        // negative weights would make the cumulative sum non-monotone
        // and the half-total selection meaningless — fail loudly
        // (raise_error is codegen'd; the happy path costs one branch)
        when(col(weightCol) < 0, raise_error(concat(
            lit(s"weightedMedian: negative weight in '$weightCol': "),
            col(weightCol).cast("string"))))
          .otherwise(floor(col(weightCol)).cast("long")).as("_w"))
      .withColumn("_cumw", sum(col("_w")).over(byG.orderBy(col("_v"))))
      .withColumn("_totw", sum(col("_w")).over(byG))
    cum.filter(col("_cumw") * 2 >= col("_totw"))
      .groupBy(group)
      .agg(max(col("_totw")).as("tot_weight"),
        min(col("_v")).as("wmedian"))
  }
}
