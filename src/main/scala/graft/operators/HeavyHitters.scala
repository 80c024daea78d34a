package graft.operators

import org.apache.spark.sql.DataFrame
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
    * with their exact counts. `support` in (0, 1].
    *
    * Exactly TWO passes over the input: the Misra-Gries summary pass
    * rides the per-partition row count along with the candidates (so N
    * needs no separate `count()` scan — at 100 TB that third scan was a
    * third of the I/O), then the exact-count pass. The per-partition
    * summary is bounded: ≤ m candidate rows + 1 count row.
    *
    * The input must be DETERMINISTIC across recomputations (same
    * discipline as the md5-based samplers): the candidate pass and the
    * exact pass each scan it once, and a source that returns different
    * rows per scan voids the no-false-negative guarantee. Cache or
    * checkpoint upstream non-deterministic inputs first. */
  def heavyHitters(df: DataFrame, keyCol: String,
      support: Double): DataFrame = {
    require(support > 0 && support <= 1, "support must be in (0, 1]")
    val spark = df.sparkSession
    import spark.implicits._
    // NULL keys (or values the long cast nulls) are excluded BEFORE the
    // Dataset[Long] encoder — a null primitive would otherwise throw an
    // opaque deserialization error mid-job; full-group-by semantics
    // would likewise skip them
    val keys = df.select(col(keyCol).cast("long").as("k"))
      .filter(col("k").isNotNull).as[Long]
    val m = math.ceil(2.0 / support).toInt
    // one pass: candidate rows (is_count=false) + one count row per
    // partition. misraGries fully consumes the iterator before
    // returning, so the count row sees the final per-partition n.
    val summary: Array[(Boolean, Long, Long)] = keys.mapPartitions { it =>
      var nPart = 0L
      val cands = misraGries(it.map { k => nPart += 1; k }, m)
      cands.map(k => (false, k, 0L)) ++ Iterator((true, 0L, nPart))
    }.collect()
    val n = summary.collect { case (true, _, c) => c }.sum
    val candidates: Array[Long] =
      summary.collect { case (false, k, _) => k }.distinct
    // NOTE the threshold is ceil of the DOUBLE product support·n —
    // IEEE drift can round a boundary product up (0.07·100 =
    // 7.000000000000001 → 8), excluding a key at exactly support·N.
    // The q37 oracle derives its cut from the SAME double product, so
    // the two engines agree; callers needing exact rational boundary
    // semantics should pass support as a pre-computed count threshold.
    val threshold = math.ceil(support * n).toLong
    keys.toDF("k")
      .join(broadcast(spark.createDataset(candidates.toSeq).toDF("k")),
        Seq("k"), "left_semi")
      .groupBy("k").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= threshold)
      .select(col("k").as(keyCol), col("cnt"))
  }
}
