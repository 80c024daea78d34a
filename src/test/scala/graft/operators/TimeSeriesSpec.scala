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

  test("a lag with a single overlapping pair yields NULL r (n < 2)") {
    val df = Seq((day(0), 1L), (day(3), 5L)).toDF("d", "x")
    val rows = TimeSeries.acf(df, "d", "x", maxLag = 3).collect()
    assert(rows.length === 1 && rows(0).getInt(0) === 3 &&
      rows(0).getLong(1) === 1L && rows(0).isNullAt(2))
  }
}
