package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Autocorrelation function (ACF) over a daily series — the telemetry
  * seasonality probe (Box & Jenkins 1970): does today's volume predict
  * tomorrow's (lag 1) or next week's (lag 7)? The first question asked
  * of any event-rate series before anomaly thresholds (e14) or drift
  * alerts (q53) are tuned, because a strongly weekly series needs
  * per-weekday baselines, not one global one.
  *
  * Semantics: Pearson correlation of the OVERLAPPING pairs
  * (x_d, x_{d+k}) for each lag k = 1..maxLag; days absent from the
  * series simply contribute no pair (no imputation — gap-filling is
  * [[EventAnalytics.gapFillDailyCounts]]'s job and composes in front
  * when zeros are the right reading).
  *
  * Exactness: all five moments (Σx, Σy, Σx², Σy², Σxy) are exact
  * DECIMAL(38,0) sums of long products — order-free, mergeable, safe
  * to ~10⁹-per-day counts over ~10⁵ days — and r is ONE fixed-shape
  * double chain over them (cast, multiply, sqrt, round 4 — the q40/
  * f18 discipline), so any engine replays it bit-for-bit.
  *
  * Scale shape: the raw corpus collapses to the day-sized series with
  * one map-side-combinable count shuffle; everything after (the lag
  * explode, the self-join on shifted day, the per-lag reduce) moves
  * O(days · maxLag) rows. At 100 TB the series frame is a few KB —
  * Spark broadcasts the join side on its own; no pairwise blowup
  * anywhere.
  */
object TimeSeries {

  /** Per-lag ACF report (lag, n, r) for lags 1..maxLag over a series
    * frame of one row per time point. `n` is the overlapping-pair
    * count; `r` is NULL when a lag has < 2 pairs or zero variance on
    * either side. `timeCol` must be a date; `valueCol` is cast to
    * long (exactness contract — quantize upstream if fractional). */
  def acf(series: DataFrame, timeCol: String, valueCol: String,
      maxLag: Int): DataFrame = {
    require(maxLag >= 1, "maxLag must be >= 1")
    val base = series.select(col(timeCol).cast("date").as("_d"),
      col(valueCol).cast("long").as("_x"))
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val left = base
      .select(col("_d"), col("_x").as("x"),
        explode(sequence(lit(1), lit(maxLag))).as("lag"))
      .withColumn("_dj", date_add(col("_d"), col("lag")))
    val right = base.select(col("_d").as("_dj"), col("_x").as("y"))
    left.join(right, "_dj")
      .groupBy("lag").agg(
        count(lit(1)).as("n"),
        sum(dec(col("x"))).as("sx"),
        sum(dec(col("y"))).as("sy"),
        sum(dec(col("x") * col("x"))).as("sxx"),
        sum(dec(col("y") * col("y"))).as("syy"),
        sum(dec(col("x") * col("y"))).as("sxy"))
      .select(col("lag"), col("n"), expr(acfRSql).as("r"))
      .orderBy("lag")
  }

  // r's expression text over the integer columns (n, sx, sy, sxx, syy,
  // sxy), shared verbatim with the DuckDB oracle: exact-moment Pearson,
  // one double chain, round 4. NULL at n < 2 or zero variance.
  private def d(x: String) = s"CAST($x AS DOUBLE)"
  private[graft] def acfRSql: String = {
    val vx = s"(${d("n")} * ${d("sxx")} - ${d("sx")} * ${d("sx")})"
    val vy = s"(${d("n")} * ${d("syy")} - ${d("sy")} * ${d("sy")})"
    s"CASE WHEN n >= 2 AND $vx > 0.0 AND $vy > 0.0 THEN " +
      s"round((${d("n")} * ${d("sxy")} - ${d("sx")} * ${d("sy")}) / " +
      s"sqrt($vx * $vy), 4) END"
  }
}
