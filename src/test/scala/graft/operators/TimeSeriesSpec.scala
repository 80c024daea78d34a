package graft.operators

import java.sql.Date

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  private def day(i: Int) = Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(i))

  test("acf matches brute-force Pearson on a seasonal series") {
    // period-3 series with noise-free repetition: lag 3 must read 1.0
    val xs = (0 until 30).map(i => Seq(10L, 20L, 40L)(i % 3))
    val df = xs.zipWithIndex.map { case (x, i) => (day(i), x) }.toDF("d", "x")
    val got = TimeSeries.acf(df, "d", "x", maxLag = 4).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), if (r.isNullAt(2)) Double.NaN else r.getDouble(2)))
      .toMap
    def brute(k: Int): (Long, Double) = {
      val pairs = (0 until 30 - k).map(i => (xs(i).toDouble, xs(i + k).toDouble))
      val n = pairs.size.toDouble
      val (sx, sy) = (pairs.map(_._1).sum, pairs.map(_._2).sum)
      val sxx = pairs.map(p => p._1 * p._1).sum
      val syy = pairs.map(p => p._2 * p._2).sum
      val sxy = pairs.map(p => p._1 * p._2).sum
      val r = (n * sxy - sx * sy) /
        math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
      (pairs.size.toLong, math.rint(r * 1e4) / 1e4)
    }
    (1 to 4).foreach { k =>
      val (n, r) = brute(k)
      assert(got(k)._1 === n, s"n at lag $k")
      assert(got(k)._2 === r, s"r at lag $k")
    }
    assert(got(3)._2 === 1.0) // the planted period
  }

  test("missing days contribute no pair; zero variance yields NULL r") {
    // days 0,1,2,4 — lag 1 pairs: (0,1),(1,2); day 4 has no neighbor
    val df = Seq((day(0), 1L), (day(1), 2L), (day(2), 3L), (day(4), 9L))
      .toDF("d", "x")
    val rows = TimeSeries.acf(df, "d", "x", maxLag = 1).collect()
    assert(rows.length === 1 && rows(0).getLong(1) === 2L)
    // constant series: r is NULL (zero variance), n still counted
    val const = (0 until 5).map(i => (day(i), 7L)).toDF("d", "x")
    val c = TimeSeries.acf(const, "d", "x", maxLag = 2).collect()
    assert(c.forall(_.isNullAt(2)))
    assert(c.map(_.getLong(1)).toSeq === Seq(4L, 3L))
  }

  test("mannKendall agrees with brute force; monotone series is loud") {
    val rnd = new scala.util.Random(41)
    val xs = (0 until 60).map(i => (i / 3 + rnd.nextInt(4)).toLong)
    val df = xs.zipWithIndex.map { case (x, i) => (day(i), x) }.toDF("d", "x")
    val r = TimeSeries.mannKendall(df, "d", "x").head()
    val sBrute = (for (i <- xs.indices; j <- i + 1 until xs.size)
      yield math.signum(xs(j).compare(xs(i))).toLong).sum
    val tieBrute = xs.groupBy(identity).values.map(_.size.toLong)
      .map(t => t * (t - 1) * (2 * t + 5)).sum
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) ===
      ((60L, sBrute, tieBrute)))
    val varS = (60.0 * 59 * 125 - tieBrute) / 18.0
    val zBrute = math.rint(
      (sBrute - math.signum(sBrute.toDouble)) / math.sqrt(varS) * 1e4) / 1e4
    assert(r.getDouble(3) === zBrute)
    assert(r.getDouble(3) > 5.0) // the planted upward drift is loud
  }

  test("mannKendall degeneracies: all tied, single point, S = 0") {
    val tied = (0 until 5).map(i => (day(i), 7L)).toDF("d", "x")
    val rt = TimeSeries.mannKendall(tied, "d", "x").head()
    assert(rt.getLong(1) === 0L && rt.isNullAt(3)) // zero variance
    val single = Seq((day(0), 1L)).toDF("d", "x")
    assert(TimeSeries.mannKendall(single, "d", "x").head().isNullAt(3))
    // perfectly balanced up/down: S = 0, z = 0 by the correction
    val bal = Seq((day(0), 1L), (day(1), 2L), (day(2), 1L))
      .toDF("d", "x")
    val rb = TimeSeries.mannKendall(bal, "d", "x").head()
    assert(rb.getLong(1) === 0L && rb.getDouble(3) === 0.0)
  }

  test("changepoint finds a planted level shift at the exact boundary") {
    // 15 days at 10, then 15 days at 30: D_k = |n·S_k − k·S_n| peaks
    // at k = 15 with value 4500 (hand-traced), split at the 15th day
    val xs = (0 until 30).map(i => if (i < 15) 10L else 30L)
    val df = xs.zipWithIndex.map { case (x, i) => (day(i), x) }.toDF("d", "x")
    val r = TimeSeries.changepoint(df, "d", "x").head()
    assert(r.getLong(0) === 30L)
    assert(r.getDate(1) === day(14))
    assert(r.getLong(2) === 4500L)
    // normalized statistic recomputed locally from the same integers
    val (n, sn) = (30.0, xs.sum.toDouble)
    val sxx = xs.map(x => x.toDouble * x).sum
    val varN = (n * sxx - sn * sn) / (n * n)
    val expect = math.rint(4500.0 / (n * math.sqrt(n) * math.sqrt(varN))
      * 1e4) / 1e4
    assert(r.getDouble(3) === expect)
  }

  test("changepoint degeneracies: constant series, single point, empty") {
    val const = (0 until 6).map(i => (day(i), 5L)).toDF("d", "x")
    val rc = TimeSeries.changepoint(const, "d", "x").head()
    assert(rc.getLong(2) === 0L && rc.isNullAt(3)) // zero variance
    assert(rc.getDate(1) === day(0)) // all-zero dk: earliest interior
    val single = Seq((day(0), 1L)).toDF("d", "x")
    val rs = TimeSeries.changepoint(single, "d", "x").head()
    assert(rs.getLong(0) === 1L && rs.isNullAt(1) && rs.getLong(2) === 0L)
    val empty = Seq.empty[(java.sql.Date, Long)].toDF("d", "x")
    val re = TimeSeries.changepoint(empty, "d", "x").head()
    assert(re.getLong(0) === 0L && re.isNullAt(1) && re.isNullAt(3))
  }

  test("a lag with a single overlapping pair yields NULL r (n < 2)") {
    val df = Seq((day(0), 1L), (day(3), 5L)).toDF("d", "x")
    val rows = TimeSeries.acf(df, "d", "x", maxLag = 3).collect()
    assert(rows.length === 1 && rows(0).getInt(0) === 3 &&
      rows(0).getLong(1) === 1L && rows(0).isNullAt(2))
  }
}
