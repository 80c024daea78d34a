package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

/** Incremental equi-join maintenance — the other half of the
  * incremental-warehouse pattern ([[IncrementalAgg]] maintains
  * aggregates; this maintains JOIN results): when batches dA and dB
  * arrive on top of stored inputs A and B,
  *
  *   (A ∪ dA) ⋈ (B ∪ dB)  =  (A ⋈ B)  ∪  dA ⋈ B  ∪  A ⋈ dB  ∪  dA ⋈ dB
  *
  * so the stored join result is extended by three delta terms, each
  * joining a (small) delta against a base — never base-against-base
  * again. The q32 gate checks the union of the four terms against a
  * full-recompute oracle, bit-identical.
  *
  * Scale shape: deltas are broadcast (a daily batch vs a 100 TB base),
  * so the three delta terms are map-side joins over one scan of each
  * base and the big bases are never shuffled; with bucketed bases even
  * the stored-result refresh is shuffle-free. Inner joins only —
  * outer-join maintenance needs retractions, which is a state model
  * (see the streaming operators), not a batch identity.
  */
object IncrementalJoin {

  /** The three delta terms: every row the update adds to `A ⋈ B`.
    * Callers union this with the stored join result.
    *
    * `broadcastDeltas` hints the delta sides (the operator's whole
    * premise: a daily batch vs a 100 TB base). Spark does NOT demote
    * an explicit hint by size — a hint is a command, not a suggestion
    * — so a caller whose "delta" can be backfill-sized must pass
    * false and let AQE pick the strategy per batch instead of OOMing
    * on a forced build side. */
  def deltaJoin(baseA: DataFrame, deltaA: DataFrame,
      baseB: DataFrame, deltaB: DataFrame, keys: Seq[String],
      broadcastDeltas: Boolean = true): DataFrame = {
    require(keys.nonEmpty, "join keys required")
    def hint(df: DataFrame) = if (broadcastDeltas) broadcast(df) else df
    hint(deltaA).join(baseB, keys)
      .unionByName(baseA.join(hint(deltaB), keys))
      .unionByName(hint(deltaA).join(hint(deltaB), keys))
  }

  /** Full maintained result: stored `A ⋈ B` plus the delta terms. */
  def maintained(storedJoin: DataFrame, baseA: DataFrame, deltaA: DataFrame,
      baseB: DataFrame, deltaB: DataFrame, keys: Seq[String]): DataFrame =
    storedJoin.unionByName(deltaJoin(baseA, deltaA, baseB, deltaB, keys))
}
