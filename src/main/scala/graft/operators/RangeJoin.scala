package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval) join: left rows with a timestamp joined to right
  * rows carrying [start, end] intervals, on equal keys with
  * start <= ts <= end.
  *
  * Spark's naive plan for the inequality condition is a broadcast/
  * nested-loop join — quadratic and unusable at scale. The scale path is
  * time binning: each left row lands in exactly ONE bin; each right
  * interval is replicated over the bins it covers (≈ length/binWidth +
  * 1); the join becomes an equi-join on (keys, bin) plus a residual
  * range filter. Exact (no dedup needed — a left row meets each interval
  * in at most one bin), shuffled by (key, bin) so hot keys spread across
  * time, and Catalyst/AQE treat it like any hash join.
  *
  * Pick `binSeconds` near the typical interval length: too small
  * replicates intervals; too large fattens bins.
  *
  * NULL semantics (inner-join): rows with a NULL left timestamp, or
  * intervals with a NULL start/end, produce a NULL bin and silently
  * drop out — matching what the inequality predicates would do in a
  * plain join. Inverted intervals (end < start) match nothing: the
  * residual filter is unsatisfiable (though `sequence` still walks
  * their bins descending — validate intervals upstream if inverted
  * rows are common enough for that replication to matter).
  */
object RangeJoin {

  def binned(left: DataFrame, leftTs: String, right: DataFrame,
      startCol: String, endCol: String, keys: Seq[String],
      binSeconds: Long): DataFrame = {
    // a zero/negative width divides to NULL bins under non-ANSI SQL and
    // the equi-join silently returns 0 rows — fail loudly instead
    require(binSeconds > 0, s"binSeconds must be positive: $binSeconds")
    val bin = lit(binSeconds)
    val l = left.withColumn("_bin",
      floor(unix_timestamp(col(leftTs)) / bin))
    val r = right.withColumn("_bin",
      explode(sequence(
        floor(unix_timestamp(col(startCol)) / bin),
        floor(unix_timestamp(col(endCol)) / bin))))
    l.join(r, keys :+ "_bin")
      .filter(col(leftTs) >= col(startCol) && col(leftTs) <= col(endCol))
      .drop("_bin")
  }
}
