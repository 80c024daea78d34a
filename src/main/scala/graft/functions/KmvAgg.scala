package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded-state bottom-k DISTINCT minima of a long hash column — the
  * KMV ("k minimum values") distinct-value sketch state (Bar-Yossef,
  * Jayram, Kumar, Sivakumar & Trevisan 2002; Beyer, Haas, Reinwald,
  * Sismanis & Gemulla 2007). The buffer is an ascending sorted
  * duplicate-free Seq of at most k hashes.
  *
  * Why an Aggregator and not `distinct + row_number window`: the
  * pre-distinct shuffles the corpus' per-task distinct hash SETS —
  * unbounded — before the window can limit anything. This runs
  * partial (map-side) + final like any built-in agg: every map task
  * keeps at most k longs per group, the shuffle carries ≤ k·partitions
  * rows, and merge is a k-bounded sorted-distinct merge. min commutes
  * with union, so the result is arrival-order-independent and
  * shard-mergeable (the q47 gate pins merged-shards == full-scan
  * bit-for-bit). [[TopKAgg]] is the per-group top-k cousin; this one
  * is global-ish (few groups, k-bounded each) and duplicate-free —
  * distinctness is what makes the k-th minimum an order statistic of
  * the VALUE SET, which is what the estimator needs.
  */
class KmvAgg(k: Int) extends Aggregator[Long, Seq[Long], Seq[Long]] {
  require(k >= 2, "k must be >= 2 (the estimator uses k-1)")

  override def zero: Seq[Long] = Seq.empty

  override def reduce(buf: Seq[Long], h: Long): Seq[Long] =
    // full buffer and h can't displace anything: O(1) reject — the hot
    // path once the sketch saturates (all but O(k log n) rows)
    if (buf.length == k && h >= buf.last) buf
    else if (buf.contains(h)) buf
    else ((buf :+ h).sorted).take(k)

  override def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] =
    (a ++ b).distinct.sorted.take(k)

  override def finish(buf: Seq[Long]): Seq[Long] = buf

  override def bufferEncoder: Encoder[Seq[Long]] =
    ExpressionEncoder[Seq[Long]]()

  override def outputEncoder: Encoder[Seq[Long]] =
    ExpressionEncoder[Seq[Long]]()
}
