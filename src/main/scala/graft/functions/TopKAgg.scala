package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded-state top-k per group: a typed Aggregator whose buffer never
  * exceeds k entries, ordered by (key DESC, id ASC) — id is the
  * deterministic tie-break.
  *
  * Why not a window? `row_number().over(partitionBy(g).orderBy(...))`
  * shuffles and sorts EVERY row of every group; with k=10 over a
  * billion-row group that's a billion-row sort for ten survivors. This
  * aggregator runs partial (map-side) + final like any built-in agg:
  * each map task keeps at most k entries per group, the shuffle
  * carries ≤ k·partitions rows per group, and merge is a k-bounded
  * list merge. Associative + commutative (the ordering is total), so
  * the result is arrival-order-independent — which is what lets the
  * w10 gate hash-match a window-function oracle exactly.
  */
class TopKAgg(k: Int)
  extends Aggregator[(Long, Long), Seq[(Long, Long)], Seq[Long]] {
  require(k >= 1, "k must be >= 1")

  // buffer: (key, id) sorted by (key DESC, id ASC), length <= k
  override def zero: Seq[(Long, Long)] = Seq.empty

  private def better(a: (Long, Long), b: (Long, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  private def insert(buf: Seq[(Long, Long)],
      row: (Long, Long)): Seq[(Long, Long)] =
    if (buf.length == k && better(buf.last, row)) buf
    else ((buf :+ row).sortWith(better)).take(k)

  override def reduce(buf: Seq[(Long, Long)],
      row: (Long, Long)): Seq[(Long, Long)] = insert(buf, row)

  override def merge(a: Seq[(Long, Long)],
      b: Seq[(Long, Long)]): Seq[(Long, Long)] =
    (a ++ b).sortWith(better).take(k)

  override def finish(buf: Seq[(Long, Long)]): Seq[Long] =
    buf.map(_._2)

  override def bufferEncoder: Encoder[Seq[(Long, Long)]] =
    ExpressionEncoder[Seq[(Long, Long)]]()

  override def outputEncoder: Encoder[Seq[Long]] =
    ExpressionEncoder[Seq[Long]]()
}
