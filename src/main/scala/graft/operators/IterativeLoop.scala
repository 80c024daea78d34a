package graft.operators

import org.apache.spark.sql.SparkSession

/** Conf discipline for fixed-shape iterative loops: run the rounds with
  * AQE DISABLED, restoring the session conf afterwards.
  *
  * The r14 A/B (sf0.1, min-of-4, stable warm neighbor in-group) was
  * decisive in BOTH directions, which is why only PageRank uses this:
  *  - PageRank's damped-contribution loop: 3.99 → 2.86 s (g01) — its
  *    layouts are pinned (persisted edge frame keeps src hashing, rank
  *    exits each round hash-partitioned on node), so AQE's per-stage
  *    materialize/replan is pure constant × rounds with nothing to
  *    improve;
  *  - the peel/frontier/normalize loops LOST with AQE off: g04 k-core
  *    1.51 → 3.30 s, g03 BFS 1.46 → 2.09 s, g05 LPA 2.63 → 3.30 s, g07
  *    HITS 3.10 → 4.07 s (d09 a wash). Their per-round frames are
  *    node-sized shuffles over the static 32 partitions — AQE's
  *    small-partition coalescing is exactly what keeps their task
  *    counts proportionate, and turning it off pays one tiny task per
  *    partition per round.
  * The deciding variable is what AQE can still do inside the loop:
  * nothing (PageRank: off wins) vs coalesce node-sized shuffles
  * (everything else: on wins). A/B per operator before adopting.
  */
object IterativeLoop {

  /** Run `body` with adaptive query execution off; always restores the
    * previous setting (exceptions included). */
  def withoutAqe[T](spark: SparkSession)(body: => T): T = {
    val key = "spark.sql.adaptive.enabled"
    val before = spark.conf.get(key, "true")
    spark.conf.set(key, "false")
    try body finally spark.conf.set(key, before)
  }

  /** Per-CALLER AQE choice for a shared loop operator: the decision is
    * a property of the GRAPH the loop runs over, not of the operator —
    * r15 measured PageRank.ranks both ways on its two call sites
    * (matched (t20,t21) group, min-of-4, sf0.1): g01's long-keyed
    * order graph wins with AQE off (the r14 drill, 6.40 → 4.24 s
    * in-sweep), while t21's string-keyed word-adjacency graph LOSES
    * with AQE off (1.84 → 1.31 s isolated when re-enabled; it had
    * read 2.33 s beside the write-heavy p-gates — the r14 "t21
    * regression" was exactly this, inherited through the shared
    * operator the round the g01 drill landed). Callers pass what their
    * graph measured. */
  def maybeWithoutAqe[T](spark: SparkSession, off: Boolean)(
      body: => T): T =
    if (off) withoutAqe(spark)(body) else body
}
