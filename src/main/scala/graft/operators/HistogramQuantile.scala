package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Equi-width histogram quantile sketch — the mergeable scale path
  * for percentiles: where the exact quantile (q38) must shuffle the
  * whole column to rank it, this keeps ONE `bins`-sized count vector
  * (mergeable across shards by addition, map-side partials free) and
  * reads quantiles off the cumulative histogram. The estimate is the
  * lower edge of the first bin whose cumulative count reaches
  * ceil(q·n) — deterministic integer arithmetic, so the sketch
  * replays bit-for-bit in any engine, with error bounded by one bin
  * width of the value span.
  *
  * Scale shape: one min/max/count aggregate (3-value driver rider,
  * the [[ZOrder]] pattern), one bin-keyed count with map-side
  * partials, then everything after runs on the `bins`-row frame: the
  * cumulative window (single-task by design — the frame is ≤ `bins`
  * rows), the percentile-threshold join, the edge arithmetic — all
  * bounded by `bins`, never by n.
  */
object HistogramQuantile {

  /** Approximate percentiles of a numeric column quantized to longs:
    * (pct, bin, est) per requested integer percentile. `value` is
    * cast to long before binning — pre-scale floats to fixed point
    * (e.g. cents) in the caller's select. */
  def quantiles(df: DataFrame, value: String, bins: Int,
      pcts: Seq[Int]): DataFrame = {
    require(bins >= 1, "bins must be >= 1")
    require(pcts.nonEmpty && pcts.forall(p => p >= 0 && p <= 100),
      "percentiles must be integers in [0, 100]")
    val spark = df.sparkSession
    import spark.implicits._
    // NULLs excluded up front: count(lit(1)) would count them into n
    // (skewing every threshold) and their NULL bin sorts FIRST in the
    // cumulative window, inflating every real bin's cum. The filter is
    // on the RAW column (parquet-pushable IsNotNull); the long cast of
    // a non-null numeric never nulls, per the operator's numeric
    // contract above.
    val v = df.filter(col(value).isNotNull)
      .select(col(value).cast("long").as("v"))
    val mm = v.agg(min(col("v")).as("lo"), max(col("v")).as("hi"),
      count(lit(1)).as("n")).head()
    require(!mm.isNullAt(0),
      "cannot sketch quantiles of an empty (or all-NULL) column")
    val (lo, hi, n) = (mm.getLong(0), mm.getLong(1), mm.getLong(2))
    val span = hi - lo + 1
    // span > 0 also catches Long wraparound (a huge positive hi with a
    // huge negative lo overflows negative — which would sail through
    // the double comparison below and bin garbage silently)
    require(span > 0,
      s"value span [$lo, $hi] overflows the binning arithmetic")
    require(span.toDouble * bins <= Long.MaxValue.toDouble,
      s"span $span x $bins bins overflows the binning arithmetic")
    val hist = v
      .select(expr(s"((v - $lo) * $bins) div $span").as("bin"))
      .groupBy("bin").agg(count(lit(1)).as("cnt"))
    val cum = hist.withColumn("cum",
      sum(col("cnt")).over(Window.orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    pcts.toDF("pct")
      .join(cum, col("cum") >= expr(s"(pct * $n + 99) div 100"))
      .groupBy("pct").agg(min(col("bin")).as("bin"))
      .select(col("pct"), col("bin"),
        expr(s"$lo + (bin * $span) div $bins").as("est"))
  }
}
