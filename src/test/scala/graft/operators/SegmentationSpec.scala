package graft.operators

import java.sql.Date

import graft.SparkSpec

class SegmentationSpec extends SparkSpec {
  import spark.implicits._

  private def d(s: String): Date = Date.valueOf(s)

  // 10 customers, one order each except c1 (3 orders) and c2 (2) — known
  // ranks in every metric
  private lazy val orders = Seq(
    (1L, d("2024-01-10"), BigDecimal("100.00")),
    (1L, d("2024-01-20"), BigDecimal("100.00")),
    (1L, d("2024-01-30"), BigDecimal("100.00")), // freq 3, recency 0, mon 300
    (2L, d("2024-01-05"), BigDecimal("50.00")),
    (2L, d("2024-01-25"), BigDecimal("50.00")), // freq 2, recency 5, mon 100
    (3L, d("2024-01-01"), BigDecimal("500.00")), // recency 29, mon 500
    (4L, d("2024-01-02"), BigDecimal("10.00")),
    (5L, d("2024-01-03"), BigDecimal("20.00")),
    (6L, d("2024-01-04"), BigDecimal("30.00")),
    (7L, d("2024-01-05"), BigDecimal("40.00")),
    (8L, d("2024-01-06"), BigDecimal("60.00")),
    (9L, d("2024-01-07"), BigDecimal("70.00")),
    (10L, d("2024-01-08"), BigDecimal("80.00"))
  ).toDF("custkey", "odate", "price")

  test("rfm: DOUBLE amounts sum exactly (per-value decimal quantize)") {
    // amounts arrive as doubles in the gate (o_totalprice) — each is
    // quantized to DECIMAL(18,2) BEFORE the sum, so the monetary string
    // is exact regardless of summation order (0.1 + 0.2 would render
    // 0.30000000000000004-ish through a double accumulator's last ulp;
    // the decimal path renders 0.30 by construction)
    val dd = Seq(
      (1L, d("2024-01-01"), 0.1), (1L, d("2024-01-02"), 0.2),
      (1L, d("2024-01-03"), 0.1), (2L, d("2024-01-04"), 5.0))
      .toDF("custkey", "odate", "price")
      .repartition(8) // spread the group across tasks
    val m = Segmentation.rfm(dd, "custkey", "odate", "price")
      .select("custkey", "monetary").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(m(1L) === "0.40")
    assert(m(2L) === "5.00")
  }

  test("rfm: quintiles are rank*5 div n + 1 in each metric's total order") {
    val out = Segmentation.rfm(orders, "custkey", "odate", "price")
      .orderBy("custkey")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
    val byCust = out.map(t => t._1 -> t).toMap
    // n=10 -> quintiles of 2 ranks each. Recency order (desc, worst
    // first): c3(29), c4(28), c5(27), c6(26), c7(25), c8(24), c9(23),
    // c10(22), c2(5), c1(0)
    assert(byCust(3L)._5 === 1L) // rank 0
    assert(byCust(1L)._5 === 5L) // rank 9 (most recent)
    assert(byCust(2L)._5 === 5L) // rank 8
    assert(byCust(7L)._5 === 3L) // rank 4
    // frequency asc: eight 1s (ranks 0-7 by custkey), c2 rank 8, c1 rank 9
    assert(byCust(1L)._6 === 5L)
    assert(byCust(2L)._6 === 5L)
    assert(byCust(3L)._6 === 1L) // first 1-order customer by custkey
    // monetary asc: c4(10) rank 0 -> 1; c3(500) rank 9 -> 5
    assert(byCust(4L)._7 === 1L)
    assert(byCust(3L)._7 === 5L)
    // monetary renders as a plain decimal string
    assert(byCust(1L)._4 === "300.00")
    // rfm code composes the three digits
    assert(byCust(3L)._8 === 115L)
    // recency_days is exact day arithmetic
    assert(byCust(3L)._2 === 29L)
    assert(byCust(1L)._2 === 0L)
  }
}
