package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** KMV ("k minimum values") distinct-value sketch (Bar-Yossef et al.
  * 2002; Beyer et al. 2007): keep the k smallest DISTINCT hash values
  * of a column; the k-th minimum's position in the hash space estimates
  * the cardinality as `(k-1) / U_(k)` with `U_(k) = h_k / 2^60`.
  *
  * ENGINE-PORTABLE like [[HyperLogLog]]: the hash is the first 15 hex
  * chars of md5 — a 60-bit integer both engines derive identically —
  * so the minima sets, and every estimate derived from them, replay
  * bit-for-bit in SQL (the estimate itself is ONE fixed-shape double
  * expression mirrored textually in the oracle, rounded to 2).
  *
  * Where HLL answers only "how many distinct", KMV's minima are a
  * uniform SAMPLE of the value set, so sketches COMPOSE under set
  * algebra: union = k smallest of the merged minima (exact — min
  * commutes with union), and the Jaccard of two sketches estimates
  * intersection cardinality (`estimateIntersection`) without HLL's
  * inclusion-exclusion error stacking. The 100 TB story mirrors q46's:
  * build per-partition (month/day/file-batch) sketches ONCE — a
  * k-bounded aggregation, ≤ k longs per task cross the shuffle
  * ([[graft.functions.KmvAgg]]) — store k longs per shard, and answer
  * any cross-shard distinct count or overlap later from sketches
  * alone, no re-scan. The q47 gate pins merged-shards == full-scan
  * minima bit-for-bit, plus a between-halves intersection estimate,
  * against a DuckDB replay of the whole pipeline.
  *
  * Trade vs HLL (q45/q46): KMV state is k·8 bytes vs HLL's m·6 bits
  * and its error is ~1/√k vs ~1.04/√m per byte — HLL wins on pure
  * cardinality; KMV buys mergeable set-operation estimates and an
  * exact-below-k regime (fewer than k distinct values ⇒ the sketch IS
  * the value set and every answer is exact, which is also what makes
  * small scale factors hash-gateable).
  */
object KmvSketch {

  /** The shared 60-bit md5 hash spine — textually identical to
    * [[HyperLogLog.registersBy]]'s: both sketches must keep hashing
    * identically or cross-sketch comparisons drift. NULLs are the
    * caller's business ([[sketchBy]] excludes them up front). */
  def hash60(value: Column): Column =
    conv(substring(md5(value.cast("string")), 1, 15), 16, 10)
      .cast("long")

  /** Per-shard bottom-k sketch: (shard, minima) with `minima` the
    * ascending duplicate-free array of the shard's k smallest hashes
    * (fewer iff the shard has fewer distinct values). One corpus pass,
    * k-bounded state per task. */
  def sketchBy(df: DataFrame, value: Column, k: Int,
      shard: Column): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val kmv = udaf(new graft.functions.KmvAgg(k))
    // NULL exclusion mirrors COUNT DISTINCT (and HLL): md5(NULL) is
    // NULL and a NULL hash would NPE the typed aggregator's Long input
    df.filter(value.isNotNull)
      .select(shard.as("shard"), hash60(value).as("h"))
      .groupBy("shard")
      .agg(kmv(col("h")).as("minima"))
  }

  /** Merge shard sketches into one bottom-k sketch row: (minima).
    * Exact — the k smallest of the union of per-shard k-minima ARE the
    * k smallest of the union of the underlying sets (any global
    * minimum is a minimum within its own shard). Input and output are
    * sketch-sized (≤ k·shards longs), never corpus-sized. */
  def merge(sketches: DataFrame, k: Int): DataFrame = {
    val kmv = udaf(new graft.functions.KmvAgg(k))
    sketches.select(explode(col("minima")).as("h"))
      .agg(kmv(col("h")).as("minima"))
  }

  /** Cardinality estimate columns from a one-row sketch frame:
    * (n_min, est). `est = (k-1) · 2^60 / h_k` when the sketch is
    * saturated, else the EXACT distinct count (an unsaturated sketch
    * holds every distinct hash). Fixed-shape double arithmetic,
    * mirrored textually by the q47 oracle. */
  def estimate(sketch: DataFrame, k: Int): DataFrame =
    sketch.select(
      size(col("minima")).cast("long").as("n_min"),
      round(
        when(size(col("minima")) < k,
          size(col("minima")).cast("double"))
          .otherwise(lit(k - 1) * pow(lit(2), lit(60)) /
            element_at(col("minima"), -1)),
        2).as("est"))

  /** Set-DIFFERENCE estimate panel between two one-row sketch frames
    * with columns (minima): |A−B| = |A| − |A∩B| and |B−A| = |B| −
    * |A∩B|, with |A∩B| from the same union-sketch ρ estimator as
    * [[estimateIntersection]] — the subtraction identity is exact on
    * sets, so the only error is the two sketch estimates'. Differences
    * clamp at 0 (sketch noise can push the subtraction negative; a
    * negative set size is never the better answer). Pure sketch
    * arithmetic over three k-arrays — answers "how many of last
    * month's values are GONE this month" from stored shard sketches
    * with no corpus re-scan. Returns one row: (n_a_min, n_b_min,
    * n_union_min, rho_num, est_a, est_b, est_intersect, est_diff_ab,
    * est_diff_ba), all estimates rounded to 2. */
  def estimateDifference(a: DataFrame, b: DataFrame, k: Int): DataFrame = {
    def est(m: Column): Column =
      when(size(m) < k, size(m).cast("double"))
        .otherwise(lit(k - 1) * pow(lit(2), lit(60)) / element_at(m, -1))
    a.select(col("minima").as("ma"))
      .crossJoin(b.select(col("minima").as("mb")))
      .select(col("ma"), col("mb"),
        slice(array_sort(array_union(col("ma"), col("mb"))), 1, k)
          .as("mu"))
      .select(
        size(col("ma")).cast("long").as("n_a_min"),
        size(col("mb")).cast("long").as("n_b_min"),
        size(col("mu")).cast("long").as("n_union_min"),
        size(array_intersect(array_intersect(col("mu"), col("ma")),
          col("mb"))).cast("long").as("rho_num"),
        est(col("ma")).as("_ea"), est(col("mb")).as("_eb"),
        est(col("mu")).as("_eu"))
      .select(col("n_a_min"), col("n_b_min"), col("n_union_min"),
        col("rho_num"), col("_ea"), col("_eb"),
        // empty-union guard (both inputs empty): 0·0/0 is NaN in Spark
        // but NULL in DuckDB — two empty sketches intersect in exactly
        // 0.0 in BOTH engines (and greatest(_, NaN) would smear the
        // NaN into both differences)
        when(col("n_union_min") > 0,
          col("rho_num") * col("_eu") / col("n_union_min"))
          .otherwise(lit(0.0)).as("_ei"))
      .select(col("n_a_min"), col("n_b_min"), col("n_union_min"),
        col("rho_num"),
        round(col("_ea"), 2).as("est_a"),
        round(col("_eb"), 2).as("est_b"),
        round(col("_ei"), 2).as("est_intersect"),
        round(greatest(col("_ea") - col("_ei"), lit(0.0)), 2)
          .as("est_diff_ab"),
        round(greatest(col("_eb") - col("_ei"), lit(0.0)), 2)
          .as("est_diff_ba"))
  }

  /** Intersection-cardinality estimate between two one-row sketch
    * frames with columns (minima): ρ·|A ∪ B| where ρ is the fraction
    * of the UNION sketch's minima present in both input sketches
    * (Beyer et al. 2007 §5). Pure sketch arithmetic — three k-arrays,
    * no data re-scan. Returns one row:
    * (n_union_min, rho_num, est_union, est_intersect). */
  def estimateIntersection(a: DataFrame, b: DataFrame, k: Int): DataFrame = {
    val u = a.select(col("minima").as("ma"))
      .crossJoin(b.select(col("minima").as("mb")))
      .select(col("ma"), col("mb"),
        slice(array_sort(array_union(col("ma"), col("mb"))), 1, k)
          .as("mu"))
    u.select(
      size(col("mu")).cast("long").as("n_union_min"),
      size(array_intersect(array_intersect(col("mu"), col("ma")),
        col("mb"))).cast("long").as("rho_num"),
      when(size(col("mu")) < k, size(col("mu")).cast("double"))
        .otherwise(lit(k - 1) * pow(lit(2), lit(60)) /
          element_at(col("mu"), -1)).as("_estu"))
      .select(col("n_union_min"), col("rho_num"),
        round(col("_estu"), 2).as("est_union"),
        // empty-union guard: 0·0/0 is NaN in Spark but NULL in DuckDB
        // (its double division returns NULL on /0) — two empty
        // sketches must estimate an exact 0.0 in BOTH engines
        round(when(col("n_union_min") > 0,
          col("rho_num") * col("_estu") / col("n_union_min"))
          .otherwise(lit(0.0)), 2).as("est_intersect"))
  }
}
