package graft.operators

import graft.SparkSpec

class HistogramQuantileSpec extends SparkSpec {
  import spark.implicits._

  private val pcts = Seq(1, 5, 25, 50, 75, 95, 99)

  private def run(vals: Seq[Long], bins: Int): Map[Int, Long] =
    HistogramQuantile.quantiles(vals.toDF("v"), "v", bins, pcts)
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap

  test("ramp 0..255 at 256 bins: one value per bin, exact estimates") {
    val est = run(0L until 256L, bins = 256)
    // thr(p) = ceil(p*256/100); first bin with cum >= thr is thr-1
    pcts.foreach { p =>
      val thr = (p * 256 + 99) / 100
      assert(est(p) === thr - 1, s"p$p")
    }
  }

  test("constant column collapses to one bin: every estimate is it") {
    val est = run(Seq.fill(100)(42L), bins = 64)
    pcts.foreach(p => assert(est(p) === 42L))
  }

  test("estimate lands within one bin width of the exact quantile") {
    // deterministic scrambled values over a wide span
    val vals = (1 to 10000).map(i => ((i.toLong * i) % 99991L) + 7L)
    val bins = 128
    val sorted = vals.sorted
    val span = sorted.last - sorted.head + 1
    val width = span / bins + 1
    val est = run(vals, bins)
    pcts.foreach { p =>
      val k = math.max(1, math.ceil(p * vals.size / 100.0).toInt)
      val exact = sorted(k - 1)
      assert(math.abs(est(p) - exact) <= width,
        s"p$p: est ${est(p)} vs exact $exact, width $width")
    }
  }

  test("degenerate bins=1: every percentile is the minimum edge") {
    val est = run(Seq(10L, 20L, 30L), bins = 1)
    pcts.foreach(p => assert(est(p) === 10L))
  }

  test("shard-merged bin counts equal the full-scan histogram; " +
    "quantiles from the merged histogram match quantiles()") {
    import org.apache.spark.sql.functions.{col, lit, pmod}
    val vals = (1 to 5000).map(i => ((i.toLong * 37) % 4001L) + 3L)
    val df = vals.toDF("v").withColumn("shard", pmod(col("v"), lit(7)))
    val (lo, hi, n) = (vals.min, vals.max, vals.size.toLong)
    val bins = 64
    val merged = HistogramQuantile.mergeCounts(
      HistogramQuantile.binCountsBy(df, "v", bins, lo, hi, col("shard")))
    val direct = HistogramQuantile.binCountsBy(
      df, "v", bins, lo, hi, lit("_all")).drop("shard")
    val m = merged.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val d = direct.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m === d)
    assert(m.values.sum === n)
    val qm = HistogramQuantile.quantilesFromCounts(
      merged, bins, lo, hi, n, pcts)
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    val q0 = HistogramQuantile.quantiles(df, "v", bins, pcts)
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(qm === q0)
  }
}
