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
    val ordered = Window.partitionBy("shard").orderBy("v")
    // ONE WindowExec: r, n and the lag all share the same
    // (partitionBy, orderBy) spec — n uses an entire-partition frame
    // over that spec rather than a bare partitionBy("shard"), which
    // Spark planned as a SECOND unbounded Window operator buffering
    // the full value frame again (the r13 q54 drill: two data-sized
    // window passes → one).
    val entire = ordered.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    df.select(shard.as("shard"), col(valueCol).cast("long").as("v"))
      .filter(col("v").isNotNull)
      .withColumn("r", row_number().over(ordered).cast("long"))
      .withColumn("n", count(lit(1)).over(entire))
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
  def mergeAll(sketches: DataFrame, k: Int): DataFrame =
    mergeAllBy(sketches.withColumn("_mg", lit("_")), col("_mg"), k)
      .drop("grp")

  /** Grouped [[mergeAll]]: input rows (grpCol, v, w); EVERY group is
    * recompressed in one window/aggregate pipeline — per-group output
    * identical to `mergeAll` over that group's rows alone, but G
    * groups cost one pass of sketch-sized jobs instead of G pipelines
    * (the r14 q54 drill: 3 readout groups ran 3 separate
    * window+crossJoin+join chains — the gate's cost was job-count
    * constants, not data). Output: (grp, v, w, cum). */
  def mergeAllBy(sketches: DataFrame, grpCol: Column, k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val spark = sketches.sparkSession
    import spark.implicits._
    // sketch-sized (≤ shards·k rows per group): the per-group
    // cumulative window is bounded by design
    val cum = sketches.select(grpCol.as("grp"), col("v"), col("w"))
      .withColumn("cum", sum(col("w")).over(
        Window.partitionBy("grp").orderBy("v", "w")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val tot = cum.groupBy("grp").agg(max(col("cum")).as("n"))
    // anchor positions p_i = ceil(i·N/k); point i = first (min-value)
    // sketch point whose cum reaches p_i; weight = p_i − p_{i−1}
    val anchors = tot.crossJoin(broadcast((1 to k).toDF("i")))
      .select(col("grp"), col("i"), expr(s"(i * n + $k - 1) div $k").as("p"))
      .filter(col("p") > 0) // empty group: no anchors, empty sketch
    anchors.join(cum.select(col("grp").as("_cg"), col("v"), col("cum")),
        col("grp") === col("_cg") && col("cum") >= col("p"))
      .groupBy("grp", "i", "p").agg(min(col("v")).as("v"))
      .withColumn("w",
        col("p") - coalesce(lag(col("p"), 1).over(
          Window.partitionBy("grp").orderBy("i")), lit(0L)))
      .filter(col("w") > 0) // k > N: collapse duplicate anchors
      .select(col("grp"), col("v"), col("w"), col("p").as("cum"))
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
    // persist: cum is read TWICE (group totals + the cum>=target
    // anchor join) — left lazy, each consumer re-runs the upstream
    // sketch-build window over the data (the q51 re-derive cliff
    // Calibration.report checkpoints against). The frame is sketch-sized
    // (shards-per-group × k rows), so materializing it is ~free.
    // persist (not localCheckpoint): the result is returned LAZY, so no
    // in-function unpersist is possible — persist is CacheManager-
    // tracked (clearCache()/Dataset.unpersist actually reclaim it,
    // where localCheckpoint blocks linger until RDD GC) and the kept
    // lineage recomputes safely if a caller drops the cache early.
    val cum = sketches.select(grpCol.as("grp"), col("v"), col("w"))
      .withColumn("cum", sum(col("w")).over(
        Window.partitionBy("grp").orderBy("v", "w")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
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

  /** Grouped [[quantiles]]: readout over a [[mergeAllBy]] result
    * ((grp, v, w, cum)) — one row per (grp, pct) with the same
    * per-group math as `quantiles` on that group alone. */
  def quantilesBy(merged: DataFrame, pcts: Seq[Int]): DataFrame = {
    val spark = merged.sparkSession
    import spark.implicits._
    val tot = merged.groupBy("grp").agg(max(col("cum")).as("n"))
    tot.crossJoin(broadcast(pcts.toDF("pct")))
      .select(col("grp"), col("pct"), col("n"),
        expr("(pct * n + 99) div 100").as("target"))
      .join(merged.select(col("grp").as("_mg"), col("v"), col("cum")),
        col("grp") === col("_mg") && col("cum") >= col("target"))
      .groupBy("grp", "pct", "n", "target").agg(min(col("v")).as("est"))
  }
}
