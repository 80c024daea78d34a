package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Exact heavy hitters (frequent items) without a full group-by over
  * the key domain — the Misra-Gries/space-saving pattern (public
  * literature, Misra & Gries 1982):
  *
  *  1. per-partition bounded summaries (mapPartitions with ≤ m
  *     counters — genuine per-partition imperative logic, the rare
  *     case where RDD-style code is the right tool) yield a candidate
  *     set with NO false negatives: if a key's global frequency is
  *     ≥ support·N, some partition's summary kept it (pigeonhole over
  *     Σ n_p with the MG guarantee f_p > n_p/(m+1), m = ⌈2/support⌉);
  *  2. an exact count of candidates only (broadcast semi-join + one
  *     aggregate over the filtered scan) removes false positives.
  *
  * Scale shape: the shuffle carries candidate keys (≤ m per
  * partition), never the key domain. A plain groupBy(key) over 100 TB
  * of high-cardinality keys shuffles every distinct key; this shuffles
  * thousands. The final answer is EXACT — keys and counts — which is
  * why the q37 gate can hash-match a plain HAVING oracle.
  */
object HeavyHitters {

  /** Misra-Gries summary of one iterator with m counters: survivors
    * include every key with frequency > n/(m+1). */
  private[operators] def misraGries(rows: Iterator[Long],
      m: Int): Iterator[Long] = {
    val counters = new scala.collection.mutable.HashMap[Long, Long]()
    rows.foreach { k =>
      counters.get(k) match {
        case Some(c) => counters.update(k, c + 1)
        case None if counters.size < m => counters.update(k, 1L)
        case None =>
          // decrement-all step; drop zeroed counters
          val dead = Seq.newBuilder[Long]
          counters.mapValuesInPlace { (key, c) =>
            if (c == 1L) dead += key
            c - 1
          }
          dead.result().foreach(counters.remove)
      }
    }
    counters.keysIterator.toSeq.iterator
  }

  /** All keys of `keyCol` (integer) with exact frequency ≥ support·N,
    * with their exact counts. `support` in (0, 1]. */
  def heavyHitters(df: DataFrame, keyCol: String,
      support: Double): DataFrame = {
    require(support > 0 && support <= 1, "support must be in (0, 1]")
    val spark = df.sparkSession
    import spark.implicits._
    val keys = df.select(col(keyCol).cast("long")).as[Long]
    val m = math.ceil(2.0 / support).toInt
    val candidates: Dataset[Long] =
      keys.mapPartitions(misraGries(_, m)).distinct()
    val n = keys.count()
    val threshold = math.ceil(support * n).toLong
    keys.toDF("k")
      .join(broadcast(candidates.toDF("k")), Seq("k"), "left_semi")
      .groupBy("k").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= threshold)
      .select(col("k").as(keyCol), col("cnt"))
  }
}
