package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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

  /** Mann–Kendall trend test (Mann 1945, Kendall 1975) — is the
    * series monotonically drifting? [[acf]]'s directional complement:
    * ACF finds the period, this finds the trend, and together they
    * decide whether e14's anomaly baseline needs detrending. S =
    * Σ_{i<j} sgn(x_j − x_i) needs no distributional assumption and
    * ignores outlier magnitude — the standard choice for telemetry.
    *
    * Exactness: S is an exact long sum of {−1, 0, 1}; the tie term
    * Σ_t t(t−1)(2t+5) is an exact DECIMAL(38,0) sum (t³-class, the
    * RankTest bound); z = (S − sgn(S))/√Var with
    * Var = [n(n−1)(2n+5) − ties]/18 and the continuity correction is
    * one fixed double chain (z = 0 at S = 0 by the correction).
    *
    * Scale shape: pair volume is SERIES-sized squared, not corpus —
    * the day frame comes out of one count shuffle, and even a century
    * of daily points is ~36k rows → ~6·10⁸ sign pairs, a bounded
    * broadcast-nested-loop by construction. The corpus itself is
    * touched once. Output one row: (n, s, tie_term, z); z NULL when
    * n < 2 or the variance is non-positive (all values tied). */
  def mannKendall(series: DataFrame, timeCol: String,
      valueCol: String): DataFrame = {
    val base = series.select(col(timeCol).as("_d"),
      col(valueCol).cast("long").as("_x"))
      .filter(col("_d").isNotNull && col("_x").isNotNull)
      .localCheckpoint() // day-sized; three consumers read one layout
    val nF = base.agg(count(lit(1)).as("n"))
    val sF = base.select(col("_d").as("d1"), col("_x").as("x"))
      .join(base.select(col("_d").as("d2"), col("_x").as("y")),
        col("d2") > col("d1"))
      .agg(coalesce(sum(when(col("y") > col("x"), 1L)
        .when(col("y") < col("x"), -1L).otherwise(0L)), lit(0L))
        .cast("long").as("s"))
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val tieF = base.groupBy("_x").agg(count(lit(1)).as("t"))
      .agg(coalesce(sum(dec(col("t")) * (dec(col("t")) - 1) *
          (dec(col("t")) * 2 + 5)), lit(java.math.BigDecimal.ZERO))
        .cast("long").as("tie_term"))
    nF.crossJoin(sF).crossJoin(tieF)
      .select(col("n"), col("s"), col("tie_term"),
        expr(mkZSql).as("z"))
  }

  /** Offline CUSUM changepoint scan (Page 1954 / Pettitt-style
    * location) — WHERE did the series' level shift? [[acf]] finds the
    * period, [[mannKendall]] finds the drift; this finds the split.
    * The statistic is max_k |S_k − (k/n)·S_n| over prefix sums S_k —
    * kept EXACT by the n-scaled form D_k = n·S_k − k·S_n (every term
    * an integer; DECIMAL(38,0) inside — n·S_k overflows a long once
    * n·Σx passes 9·10¹⁸, i.e. ~10⁵ days of 10⁹-count traffic), with
    * the argmax day as the estimated changepoint (ties → earliest
    * day, a total order). The normalized readout
    * cusum = D_max/(n·√n·σ̂) with σ̂ from the exact global moments is
    * one fixed double chain — compare to the Kolmogorov-style ~1.36
    * line for a rough α=.05 read; the gate pins the exact integers
    * regardless.
    *
    * Scale shape: one count shuffle to the day-sized series, then a
    * day-sized ordered window (bounded by the series, never the
    * corpus) and a 1-row reduce. Output one row:
    * (n, split_day, d_max, cusum). cusum NULL when n < 2 or the
    * series is constant. */
  def changepoint(series: DataFrame, timeCol: String,
      valueCol: String): DataFrame = {
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val base = series.select(col(timeCol).as("_d"),
      col(valueCol).cast("long").as("_x"))
      .filter(col("_d").isNotNull && col("_x").isNotNull)
      .localCheckpoint() // day-sized; two consumers must not re-run
                         // the caller's corpus aggregate
    // day-sized frame: the single-partition ordered window is bounded
    // by the series length by construction
    val w = Window.orderBy("_d")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val pre = base
      .withColumn("k", count(lit(1)).over(w))
      .withColumn("sk", sum(col("_x")).over(w))
    val tot = base.agg(count(lit(1)).as("n"),
      sum(col("_x")).as("sn"),
      sum(dec(col("_x")) * col("_x")).as("sxx"))
    val scored = pre.crossJoin(broadcast(tot))
      .withColumn("dk", abs(dec(col("sk")) * col("n")
        - dec(col("sn")) * col("k")))
      // the last point always scores 0 (S_n − n/n·S_n); excluding it
      // keeps split_day a real interior candidate set for n >= 2
      .filter(col("k") < col("n"))
    val best = scored.agg(
      min_by(col("_d"), struct((-col("dk")).as("a"), col("_d").as("b")))
        .as("split_day"),
      coalesce(max(col("dk")), lit(java.math.BigDecimal.ZERO))
        .cast("decimal(38,0)").as("d_max"))
    // coalesce(…, 0): an all-empty input reports zero counts with a
    // NULL split_day/cusum, not NULL longs (the RankTest contract)
    tot.crossJoin(broadcast(best))
      .select(coalesce(col("n"), lit(0L)).cast("long").as("n"),
        coalesce(col("sn"), lit(0L)).cast("long").as("sn"),
        coalesce(col("sxx"), lit(java.math.BigDecimal.ZERO))
          .cast("decimal(38,0)").as("sxx"),
        col("split_day"), col("d_max"))
      .select(col("n"), col("split_day"),
        col("d_max").cast("long").as("d_max"),
        expr(cusumSql).as("cusum"))
  }

  // cusum's expression text over (n, sn, sxx, d_max): σ̂² from the
  // exact moments, D_max/(n·√n·σ̂), round 4
  private[graft] def cusumSql: String = {
    val varN = s"((${d("n")} * ${d("sxx")} - ${d("sn")} * ${d("sn")}) " +
      s"/ (${d("n")} * ${d("n")}))"
    s"CASE WHEN n >= 2 AND $varN > 0.0 THEN " +
      s"round(${d("d_max")} / (${d("n")} * sqrt(${d("n")}) * " +
      s"sqrt($varN)), 4) END"
  }

  // z's expression text over (n, s, tie_term), shared verbatim with
  // the oracle: Var in doubles from the exact integers, continuity
  // correction via the sign CASE
  private[graft] def mkZSql: String = {
    val varS = s"((${d("n")} * (${d("n")} - 1.0) * " +
      s"(2.0 * ${d("n")} + 5.0) - ${d("tie_term")}) / 18.0)"
    val sgn = "CASE WHEN s > 0 THEN 1.0 WHEN s < 0 THEN -1.0 " +
      "ELSE 0.0 END"
    s"CASE WHEN n >= 2 AND $varS > 0.0 THEN " +
      s"round((${d("s")} - ($sgn)) / sqrt($varS), 4) END"
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
