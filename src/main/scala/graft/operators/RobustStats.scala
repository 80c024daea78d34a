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
}
