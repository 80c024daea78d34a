package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Single-scan column profiler — the data-quality sweep that precedes
  * any large ingest: per column, null count, exact distinct count, and
  * min/max (rendered as strings so one result schema serves every
  * column type).
  *
  * Scale shape: ALL columns' stats ride one aggregation over one scan —
  * Spark plans the multi-column distinct via Expand (one extra
  * map-side row per profiled column, partial-aggregated before the
  * shuffle), not one job per column. Profiling 50 columns of a 100 TB
  * table is still a single pass. The unpivot to one-row-per-column is
  * a `stack` over the single aggregated row — driver-side size, zero
  * extra jobs.
  */
object Profile {

  /** One row per profiled column: (col_name, n_nulls, n_distinct,
    * min_s, max_s). Distinct counts are exact (use HLL upstream when
    * approximate is enough — see q25); min/max are cast to string. */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "need at least one column to profile")
    val aggs = cols.flatMap { c => Seq(
      count(col(c)).as(s"${c}__nn"),
      countDistinct(col(c)).as(s"${c}__nd"),
      min(col(c)).cast("string").as(s"${c}__mn"),
      max(col(c)).cast("string").as(s"${c}__mx")) }
    val all = count(lit(1)).as("__total") +: aggs
    val row = df.agg(all.head, all.tail: _*)
    val stackArgs = cols.map { c =>
      s"'$c', `${c}__nn`, `${c}__nd`, `${c}__mn`, `${c}__mx`"
    }.mkString(", ")
    row.selectExpr("__total",
      s"stack(${cols.size}, $stackArgs) AS " +
        "(col_name, n_nonnull, n_distinct, min_s, max_s)")
      .select(col("col_name"),
        (col("__total") - col("n_nonnull")).as("n_nulls"),
        col("n_distinct"), col("min_s"), col("max_s"))
  }
}
