package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sharded heavy-hitter rollup with deterministic error bounds — the
  * candidate-push pattern (TPUT / threshold-algorithm family) that
  * answers "global top keys" from per-shard summaries WITHOUT a
  * global re-scan: each shard keeps its exact top-k (plus the count
  * it had to drop), and the merge derives, for every surviving
  * candidate, a lower bound (sum of kept counts) and an upper bound
  * (kept counts + the caps of shards where it wasn't kept).
  *
  * The recall guarantee is a THEOREM, not a heuristic: a key absent
  * from every shard's kept set has per-shard count ≤ that shard's cap
  * (the count at rank k+1 — the largest dropped), so its global count
  * is ≤ Σ caps. Any key with global count STRICTLY above Σ caps is
  * therefore guaranteed to be a candidate, and for every candidate
  * lb ≤ exact ≤ ub. Everything is exact integer arithmetic with a
  * (count desc, key asc) tie-break, so two engines replay the same
  * candidate set and the same bounds bit-for-bit.
  *
  * Scale shape: ONE shuffle on (shard, key) for the exact counts —
  * or zero, when shards align with ingest partitions and the counts
  * are rolled up at write time (the q46 monthly-rollup discipline);
  * the per-shard rank-(k+1) filter plans as a WindowGroupLimit, so
  * each task retains k+1 rows per shard instead of sorting whole
  * shard partitions (spec-pinned); after that only shards·(k+1)
  * summary rows ever move. The merge is candidate-sized.
  *
  * Cross-engine caveat: a NULL key tied on count with a non-NULL key
  * sorts first in Spark but last in DuckDB's default — replay with an
  * explicit NULLS FIRST (or guarantee non-NULL keys, as the gate's
  * column does) when mirroring the tie-break.
  */
object ShardTopK {

  /** Per-candidate merged bounds from per-shard top-k summaries:
    * (key, lb, ub, n_present, total_caps, n_shards) — one row per key
    * kept by at least one shard; `lb` = Σ kept counts ≤ exact global
    * count ≤ `ub` = lb + Σ caps of the shards that didn't keep it;
    * `n_present` = shards that kept it. NULL keys count like any
    * other group (they'd be a real heavy hitter worth surfacing);
    * NULL shard values form their own shard. */
  def candidateBounds(df: DataFrame, key: String, shard: Column,
      k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    // Materialize the ranked frame ONCE — kept, caps, and the shard
    // list all read this shards·(k+1)-row frame, and lazily each
    // would re-run the count shuffle + window
    val ranked = rankedTopK(df, key, shard, k).localCheckpoint()
    val kept = ranked.filter(col("rn") <= k)
    // cap = count at rank k+1 (the largest dropped; 0 when the shard
    // had ≤ k keys). The shard list comes from rank-1 rows — every
    // non-empty shard has one — so short shards still contribute cap 0
    val caps = ranked.filter(col("rn") === 1).select(col("_shard"))
      .join(ranked.filter(col("rn") === k + 1)
        .select(col("_shard"), col("cnt").as("cap")), Seq("_shard"), "left")
      .select(col("_shard"), coalesce(col("cap"), lit(0L)).as("cap"))
    val tot = caps.agg(sum(col("cap")).cast("long").as("total_caps"),
      count(lit(1)).as("n_shards"))
    kept.join(caps, "_shard")
      .groupBy(col(key))
      .agg(sum(col("cnt")).cast("long").as("lb"),
        sum(col("cap")).cast("long").as("_cap_present"),
        count(lit(1)).as("n_present"))
      .crossJoin(broadcast(tot))
      .select(col(key), col("lb"),
        (col("lb") + col("total_caps") - col("_cap_present")).as("ub"),
        col("n_present"), col("total_caps"), col("n_shards"))
  }

  /** Exact per-shard counts ranked (cnt desc, key asc), truncated at
    * rank k+1 — rows 1..k are the kept summary, row k+1 carries the
    * shard's drop cap. The rank ≤ k+1 filter plans as a
    * WindowGroupLimit (spec-pinned on THIS frame — the checkpoint in
    * [[candidateBounds]] truncates the downstream explain), so each
    * task retains k+1 rows per shard rather than sorting whole shard
    * partitions. */
  private[operators] def rankedTopK(df: DataFrame, key: String,
      shard: Column, k: Int): DataFrame =
    df.groupBy(shard.as("_shard"), col(key))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("rn", row_number().over(Window.partitionBy("_shard")
        .orderBy(col("cnt").desc, col(key).asc)))
      .filter(col("rn") <= k + 1)
}
