package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mergeable rank-error quantile sketch — the summary family member
  * still missing beside HLL (q45/q46), KMV (q47/q49), CountMin and the
  * fixed-domain histogram (q48): percentiles over a DRIFTING domain
  * answered from stored shard sketches, no re-scan and no caller-
  * supplied bin edges.
  *
  * Design: each shard keeps its k evenly-spaced ORDER STATISTICS with
  * gap weights — the uniform-compression member of the mergeable
  * ε-approximate quantile summaries (Greenwald & Khanna, SIGMOD'01;
  * mergeability per Agarwal et al., "Mergeable Summaries", PODS'12;
  * t-digest/KLL are the adaptive/randomized members). Chosen over
  * KLL/t-digest deliberately: the state is a pure function of the
  * shard's value multiset (no randomized compaction, no insertion-
  * order dependence), so the identical integer arithmetic replays in
  * any engine and merged results are bit-deterministic — the KMV hash
  * discipline, applied to ranks.
  *
  * Exactness contract (all integer):
  *  - build keeps shard ranks r ∈ {⌈i·n/k⌉ : i = 1..k} — detected by
  *    the staircase jump (r·k) div n > ((r−1)·k) div n — each with
  *    weight = gap to the previous kept rank; Σw = n, ≤ k points,
  *    every point an actual data value at an exactly-known rank;
  *  - mergeAll unions any number of sketches (a multiset — merge-order
  *    independent by construction), cumulates weights in (value, w)
  *    order, and re-picks k anchors at cum positions ⌈i·N/k⌉;
  *  - readout: estimate for target rank t = min value with cum ≥ t.
  *
  * Rank-error envelope (spec-proved): a point's sketch rank differs
  * from its true rank by ≤ Σ_s ⌈n_s/k⌉ (union of per-shard gaps), and
  * the recompression/readout adds ≤ ⌈N/k⌉ — so an estimate for target
  * t is a value whose true rank interval intersects
  * [t − ε, t + ε], ε = Σ_s ⌈n_s/k⌉ + ⌈N/k⌉. For S shards that is
  * ≤ N/k + S + N/k — tighten by raising k, independent of the domain.
  *
  * Scale shape: build is one shuffle-by-shard + per-shard sort (the
  * irreducible cost of exact order statistics; at 100 TB shard =
  * partition/day/source, each sorted independently); everything after
  * is sketch-sized (≤ shards·k rows) — merges and readouts run on
  * stored sketches without touching the data, the q45–q49 rollup
  * story. Bounded single-task windows only on sketch-sized frames
  * (the HistogramQuantile.quantilesFromCounts discipline).
  */
object QuantileSketch {

  /** Per-shard sketch: (shard, v, w) — ≤ k rows per shard, Σw = n_s,
    * each v the shard value at exactly rank cum(w). NULL values are
    * excluded (they have no rank). */
  def build(df: DataFrame, valueCol: String, shard: Column,
      k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val byShard = Window.partitionBy("shard")
    val ordered = Window.partitionBy("shard").orderBy("v")
    df.select(shard.as("shard"), col(valueCol).cast("long").as("v"))
      .filter(col("v").isNotNull)
      .withColumn("r", row_number().over(ordered).cast("long"))
      .withColumn("n", count(lit(1)).over(byShard))
      .filter(expr(s"(r * $k) div n > ((r - 1) * $k) div n"))
      .withColumn("w",
        col("r") - coalesce(lag(col("r"), 1).over(ordered), lit(0L)))
      .select(col("shard"), col("v"), col("w"))
  }

  /** Union any number of shard sketches (rows (v, w), shard column
    * ignored if present) and recompress to exactly k points. Input
    * row order is irrelevant — the result is a function of the
    * (v, w) multiset. Output: (v, w, cum) with cum = Σw up to and
    * including the point, cum(last) = N. */
  def mergeAll(sketches: DataFrame, k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val spark = sketches.sparkSession
    import spark.implicits._
    // sketch-sized (≤ shards·k rows): the single-task cumulative
    // window is bounded by design
    val cum = sketches.select(col("v"), col("w"))
      .withColumn("cum", sum(col("w")).over(Window.orderBy("v", "w")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val tot = cum.agg(max(col("cum")).as("n"))
    // anchor positions p_i = ceil(i·N/k); point i = first (min-value)
    // sketch point whose cum reaches p_i; weight = p_i − p_{i−1}
    val anchors = (1 to k).toDF("i").crossJoin(broadcast(tot))
      .select(col("i"), expr(s"(i * n + $k - 1) div $k").as("p"))
      .filter(col("p") > 0) // empty input: no anchors, empty sketch
    anchors.join(cum, col("cum") >= col("p"))
      .groupBy("i", "p").agg(min(col("v")).as("v"))
      .withColumn("w",
        col("p") - coalesce(lag(col("p"), 1).over(Window.orderBy("i")),
          lit(0L)))
      .filter(col("w") > 0) // k > N: collapse duplicate anchors
      .select(col("v"), col("w"), col("p").as("cum"))
  }

  /** Per-GROUP percentile readout directly from unioned shard
    * sketches — the telemetry shape ("p99 per service" from stored
    * per-(service, day) sketches, no re-scan). Input rows carry
    * (grpCol, v, w) from [[build]] with shard = (group, sub-shard);
    * output one row per (grp, pct): (grp, pct, n, target, est).
    *
    * No recompression: reading the raw union TIGHTENS the envelope to
    * ε = Σ_s ⌈n_s/k⌉ (the [[mergeAll]] path adds a second ⌈N/k⌉ term
    * — compress only when storing, not when reading). The cumulative
    * window partitions by group, bounded by shards-per-group · k rows
    * — never by n. */
  def groupQuantiles(sketches: DataFrame, grpCol: Column,
      pcts: Seq[Int]): DataFrame = {
    require(pcts.nonEmpty, "pcts must be non-empty")
    val spark = sketches.sparkSession
    import spark.implicits._
    // localCheckpoint: cum is read TWICE (group totals + the cum>=target
    // anchor join) — left lazy, each consumer re-runs the upstream
    // sketch-build window over the data (the q51 re-derive cliff
    // Calibration.report checkpoints against). The frame is sketch-sized
    // (shards-per-group × k rows), so materializing it is ~free.
    val cum = sketches.select(grpCol.as("grp"), col("v"), col("w"))
      .withColumn("cum", sum(col("w")).over(
        Window.partitionBy("grp").orderBy("v", "w")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .localCheckpoint()
    val tot = cum.groupBy("grp").agg(max(col("cum")).as("n"))
    val anchors = tot.crossJoin(broadcast(pcts.toDF("pct")))
      .select(col("grp"), col("pct"), col("n"),
        expr("(pct * n + 99) div 100").as("target"))
    anchors.join(cum.select(col("grp").as("_g"), col("v"), col("cum")),
        col("grp") === col("_g") && col("cum") >= col("target"))
      .groupBy("grp", "pct", "n", "target").agg(min(col("v")).as("est"))
  }

  /** Percentile readout from a merged sketch ((v, w, cum) with total N
    * = max cum): one row per pct — (pct, n, target, est) with target =
    * ⌈pct·N/100⌉ (the HistogramQuantile rank pin) and est = min value
    * with cum ≥ target. */
  def quantiles(merged: DataFrame, pcts: Seq[Int]): DataFrame = {
    val spark = merged.sparkSession
    import spark.implicits._
    val tot = merged.agg(max(col("cum")).as("n"))
    pcts.toDF("pct").crossJoin(broadcast(tot))
      .select(col("pct"), col("n"),
        expr("(pct * n + 99) div 100").as("target"))
      .join(merged, col("cum") >= col("target"))
      .groupBy("pct", "n", "target").agg(min(col("v")).as("est"))
  }
}
