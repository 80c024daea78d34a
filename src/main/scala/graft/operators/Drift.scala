package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Population Stability Index — THE production distribution-drift
  * metric: did this month's value distribution move against the
  * reference snapshot enough to re-examine the pipeline (rule of
  * thumb: < 0.1 stable, 0.1–0.25 drifting, > 0.25 shifted)?
  *   PSI = Σ_bins (p_b − q_b) · ln(p_b / q_b)
  * with Laplace-smoothed shares p_b = (cnt_b + 1)/(n + bins), so an
  * empty bin contributes a finite term on BOTH sides. The shares stay
  * RATIONAL doubles (cnt+1)/(n+bins) — a ppm floor division would
  * round an empty bin's share to 0 once n passes 10⁶ rows and feed
  * ln(0) — and each term is DECIMAL(28,14)-quantized before the exact
  * sum (the t12 recipe), so the scalar replays bit-for-bit.
  *
  * Scale shape: ONE pass over both snapshots through the SAME
  * [[HistogramQuantile.binCountsBy]] spine as q43/q48 (side = shard —
  * the counts are the mergeable rollup, so monthly PSI against a
  * stored reference histogram needs no re-scan of the reference);
  * everything after is bins-sized. Caller supplies the fixed [lo, hi]
  * domain (the binCountsBy contract; a data-derived domain costs the
  * q48-documented extra min/max pass, which the gate pays and says so).
  */
object Drift {

  /** Per-bin drift report between two LONG-valued snapshots: the
    * top-`k` bins by |contribution| (bin, ref_cnt, cur_cnt, contrib)
    * with (psi, n_ref, n_cur) riding on every row.
    *
    * Values outside [lo, hi] are CLAMPED into the edge bins (bin 0 /
    * bin bins-1), never dropped: in the stored-reference-histogram
    * deployment, current data drifting past the reference domain is
    * the strongest possible drift signal — excluded mass would make
    * exactly that shift invisible to the PSI. */
  def psiReport(ref: DataFrame, cur: DataFrame, valueCol: String,
      bins: Int, lo: Long, hi: Long, k: Int = 10): DataFrame = {
    require(bins > 0 && k > 0, "bins and k must be positive")
    val spark = ref.sparkSession
    val clamped = least(greatest(col(valueCol), lit(lo)), lit(hi))
    val both = ref.select(clamped.as("v"), lit("ref").as("side"))
      .unionByName(
        cur.select(clamped.as("v"), lit("cur").as("side")))
    val hist = HistogramQuantile
      .binCountsBy(both, "v", bins, lo, hi, col("side"))
      .localCheckpoint() // bins-sized; read by both side splits
    def side(s: String, as: String) =
      hist.filter(col("shard") === s)
        .select(col("bin"), col("cnt").as(as))
    // full bin spine: empty bins are REAL PSI terms (via smoothing),
    // not absent rows
    val full = spark.range(bins).select(col("id").as("bin"))
      .join(side("ref", "rc"), Seq("bin"), "left")
      .join(side("cur", "cc"), Seq("bin"), "left")
      .select(col("bin"), coalesce(col("rc"), lit(0L)).as("ref_cnt"),
        coalesce(col("cc"), lit(0L)).as("cur_cnt"))
      .localCheckpoint() // bins-sized; read by totals + terms + top-k
    val tot = full.agg(sum(col("ref_cnt")).cast("long").as("n_ref"),
      sum(col("cur_cnt")).cast("long").as("n_cur"))
    val terms = full.crossJoin(broadcast(tot))
      .select(col("bin"), col("ref_cnt"), col("cur_cnt"),
        expr(psiTermSql(bins)).as("_t"))
    val psi = terms
      .agg(sum(expr("CAST(_t AS DECIMAL(28,14))")).as("_s"))
      .select(expr("round(CAST(_s AS DOUBLE), 6)").as("psi"))
    terms
      .select(col("bin"), col("ref_cnt"), col("cur_cnt"),
        expr("round(_t, 8)").as("contrib"))
      .crossJoin(broadcast(tot))
      .crossJoin(broadcast(psi))
      .orderBy(abs(col("contrib")).desc, col("bin"))
      .limit(k)
  }

  /** One bin's PSI term over columns (ref_cnt, cur_cnt, n_ref, n_cur)
    * — text shared verbatim with the oracle. */
  private[graft] def psiTermSql(bins: Int): String = {
    val p = s"((CAST(ref_cnt AS DOUBLE) + 1.0) / " +
      s"(CAST(n_ref AS DOUBLE) + $bins.0))"
    val q = s"((CAST(cur_cnt AS DOUBLE) + 1.0) / " +
      s"(CAST(n_cur AS DOUBLE) + $bins.0))"
    s"(($p - $q) * ln($p / $q))"
  }
}
