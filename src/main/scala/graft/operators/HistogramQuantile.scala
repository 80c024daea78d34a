package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
    * (e.g. cents) in the caller's select.
    *
    * TWO-PASS COST, by design: this convenience entry point derives
    * the bin edges from a min/max/count pre-pass, so the column is
    * scanned twice — fine when the scan is cheap or cached, wasteful
    * at 100 TB. The one-pass path already exists and IS the production
    * shape: callers that know the domain (business bounds, partition
    * metadata, parquet column stats — min/max come free from footers)
    * call [[binCountsBy]] with those fixed edges directly and read
    * quantiles off [[quantilesFromCounts]]; out-of-domain rows under
    * supplied edges violate the fixed-domain contract documented
    * there. q48 deliberately pays the pre-pass because its gate
    * derives edges from data; its COVERAGE note records the choice. */
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
    val hist = binCountsBy(v.toDF(), "v", bins, lo, hi, lit("_all"))
      .drop("shard")
    quantilesFromCounts(hist, bins, lo, hi, n, pcts)
  }

  /** Per-shard equi-width bin counts over a FIXED [lo, hi] domain:
    * (shard, bin, cnt). This is the sketch's production shape at
    * 100 TB — the q46/q47 discipline: bin each partition (day/month/
    * file batch) ONCE against shared edges, store ≤ `bins` rows per
    * shard, and answer any cross-shard quantile later by summing
    * counts ([[mergeCounts]]) — addition is associative/commutative,
    * so rollups compose and arrive-order never matters. `value` rows
    * outside [lo, hi] violate the fixed-domain contract (the caller
    * derives edges from a global pass or a known domain); they would
    * land in out-of-range bins rather than clamp. [[quantiles]]
    * delegates here with a constant shard so the one-shot and rollup
    * paths share ONE binning spine and cannot drift (q48 pins the
    * identity end-to-end). */
  def binCountsBy(df: DataFrame, value: String, bins: Int, lo: Long,
      hi: Long, shard: Column): DataFrame = {
    val span = hi - lo + 1
    require(span > 0, s"value span [$lo, $hi] overflows")
    // Same overflow guard as quantiles(): this is ALSO a public entry
    // point (the documented 100 TB rollup path), and (v - lo) * bins
    // with a wide [lo, hi] domain would wrap silently and bin garbage.
    require(span.toDouble * bins <= Long.MaxValue.toDouble,
      s"span $span x $bins bins overflows the binning arithmetic")
    df.filter(col(value).isNotNull)
      .select(shard.as("shard"),
        expr(s"(($value - $lo) * $bins) div $span").as("bin"))
      .groupBy("shard", "bin").agg(count(lit(1)).as("cnt"))
  }

  /** Merge shard histograms into one (bin, cnt) frame — plain
    * addition, sketch-sized input (≤ bins·shards rows). */
  def mergeCounts(hist: DataFrame): DataFrame =
    hist.groupBy("bin").agg(sum(col("cnt")).as("cnt"))

  /** Quantile read-off from a (bin, cnt) histogram built against
    * [lo, hi]: (pct, bin, est) per requested percentile. Runs entirely
    * on the ≤ `bins`-row frame (the single-task cumulative window is
    * bounded by design). */
  def quantilesFromCounts(hist: DataFrame, bins: Int, lo: Long,
      hi: Long, n: Long, pcts: Seq[Int]): DataFrame = {
    val spark = hist.sparkSession
    import spark.implicits._
    val span = hi - lo + 1
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
