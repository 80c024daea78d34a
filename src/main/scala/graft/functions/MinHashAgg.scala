package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed Aggregator that UNIONs MinHash signatures across rows
  * (element-wise min) — the sketch analogue of set union.
  *
  * Use case: group-level near-dup detection. Each row carries a
  * per-document MinHash signature (graft.plans.MinHashSignature); this
  * aggregator folds a group (a source, a domain, a crawl shard) into one
  * signature whose estimated Jaccard vs another group's is
  * `matching positions / k`. Associative + commutative, so Spark runs it
  * partial (map-side) + final like any built-in agg — constant-size
  * state, shuffle carries k longs per group, never the documents.
  */
class MinHashAgg(k: Int) extends Aggregator[Seq[Long], Array[Long], Seq[Long]] {

  override def zero: Array[Long] = Array.fill(k)(Long.MaxValue)

  override def reduce(buf: Array[Long], row: Seq[Long]): Array[Long] = {
    var i = 0
    val n = math.min(k, row.length)
    while (i < n) {
      if (row(i) < buf(i)) buf(i) = row(i)
      i += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < k) {
      if (b(i) < a(i)) a(i) = b(i)
      i += 1
    }
    a
  }

  override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()

  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}

object MinHashAgg {
  /** Estimated Jaccard similarity between two equal-length signatures. */
  def estimateJaccard(a: Seq[Long], b: Seq[Long]): Double = {
    require(a.length == b.length && a.nonEmpty)
    a.zip(b).count { case (x, y) => x == y }.toDouble / a.length
  }
}
