package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable incremental aggregation — the incremental-warehouse load
  * pattern: aggregate each new batch/partition ONCE into a compact
  * partial state, merge states by key, never rescan history. Works
  * because the partials are associative and commutative: counts add,
  * and DECIMAL sums are exact, so merging per-batch states is
  * bit-identical to a full recompute over the union (the q27 gate
  * checks exactly that against a full-recompute oracle).
  *
  * Scale shape: each batch aggregation is a map-side-combined shuffle
  * of its own batch only; the merge shuffles state rows (one per key),
  * not facts. The state table can itself be stored and re-merged with
  * tomorrow's partial — state ⊕ delta has the same schema as state.
  */
object IncrementalAgg {

  /** Per-key partial state of one batch: (keys..., cnt, total). */
  def partial(batch: DataFrame, keys: Seq[String],
      value: Column): DataFrame = {
    require(keys.nonEmpty, "keys required")
    batch.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("cnt"),
        sum(value.cast("decimal(18,4)")).as("total"))
  }

  /** Merge any number of partial states (associative: merge(a, b, c)
    * == merge(merge(a, b), c) == a full recompute over the union). */
  def merge(keys: Seq[String], states: DataFrame*): DataFrame = {
    require(states.nonEmpty, "at least one state required")
    states.reduce(_ unionByName _)
      .groupBy(keys.map(col): _*)
      .agg(sum(col("cnt")).as("cnt"), sum(col("total")).as("total"))
  }

  /** Per-key DISTINCT-count state of one batch as an HLL sketch —
    * the incremental form of count(DISTINCT v). An exact distinct can't
    * be maintained incrementally without keeping every seen value; the
    * sketch state is constant-size, and sketch merging is EXACT: the
    * register state of `union(sketch(A), sketch(B))` is identical to
    * `sketch(A ∪ B)` (element-wise register max is associative/
    * commutative/idempotent), so the merged estimate equals the
    * full-recompute estimate bit-for-bit — the spec asserts equality,
    * not tolerance. */
  def distinctPartial(batch: DataFrame, keys: Seq[String],
      value: Column): DataFrame = {
    require(keys.nonEmpty, "keys required")
    batch.groupBy(keys.map(col): _*)
      .agg(hll_sketch_agg(value).as("sketch"))
  }

  /** Merge distinct-count states and estimate: (keys..., approx_nd). */
  def distinctMerge(keys: Seq[String], states: DataFrame*): DataFrame = {
    require(states.nonEmpty, "at least one state required")
    states.reduce(_ unionByName _)
      .groupBy(keys.map(col): _*)
      .agg(hll_sketch_estimate(hll_union_agg(col("sketch")))
        .as("approx_nd"))
  }
}
