package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SkewReportSpec extends SparkSpec {
  import spark.implicits._

  test("ranks, ppm shares, max/avg ratio, and entropy are exact") {
    // a x6, b x3, c x1: n=10, keys=3, max=6
    val df = (Seq.fill(6)("a") ++ Seq.fill(3)("b") ++ Seq("c")).toDF("k")
    val rows = SkewReport.report(df, "k", k = 10).collect()
    assert(rows.map(_.getString(1)).toSeq === Seq("a", "b", "c"))
    assert(rows.map(_.getInt(0)).toSeq === Seq(1, 2, 3))
    assert(rows.map(_.getLong(2)).toSeq === Seq(6L, 3L, 1L))
    assert(rows.map(_.getLong(3)).toSeq ===
      Seq(600000L, 300000L, 100000L)) // share_ppm, floor division
    val r0 = rows.head
    assert(r0.getLong(4) === 10L && r0.getLong(5) === 3L)
    // max/avg = 6 / (10/3) = 1.8 -> 1800000 ppm exactly
    assert(r0.getLong(6) === 1800000L)
    // H = ln(10) - (6 ln 6 + 3 ln 3 + 1 ln 1)/10
    val h = math.log(10) - (6 * math.log(6) + 3 * math.log(3)) / 10
    assert(r0.getDouble(7) ===
      BigDecimal(h).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("top-k truncates; NULL keys form their own (countable) group") {
    val df = (Seq.fill(4)(Some("x")) ++ Seq.fill(3)(Option.empty[String]) ++
      Seq(Some("y"), Some("z"))).toDF("k")
    val top2 = SkewReport.report(df, "k", k = 2).collect()
    assert(top2.length === 2)
    assert(top2(0).getString(1) === "x" && top2(0).getLong(2) === 4L)
    // rank 2 is the NULL group: 3 rows — a null key hot-spots a
    // shuffle exactly like any value, so the report must show it
    assert(top2(1).isNullAt(1) && top2(1).getLong(2) === 3L)
    assert(top2(1).getLong(5) === 4L) // n_keys counts the null group
  }

  test("uniform keys: ratio exactly 1e6, entropy = ln(n_keys)") {
    val df = (1 to 8).flatMap(i => Seq.fill(5)(s"k$i")).toDF("k")
    val r = SkewReport.report(df, "k", k = 3).head()
    assert(r.getLong(6) === 1000000L)
    assert(r.getDouble(7) === BigDecimal(math.log(8))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }
}
