package graft.operators

import graft.SparkSpec

class WeightedMedianSpec extends SparkSpec {

  private def wm(rows: Seq[(String, Double, Double)]) = {
    import spark.implicits._
    RobustStats.weightedMedian(rows.toDF("g", "v", "w"), "g", "v", "w")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1).toSeq
  }

  test("weight mass, not row count, picks the median") {
    // values 1,2,3 with weights 1,1,5: half of W=7 is 3.5 -> first v
    // with cumw*2 >= 7 is v=3 (cumw=7)... check: v=2 cumw=2, 4 < 7.
    assert(wm(Seq(("a", 1.0, 1.0), ("a", 2.0, 1.0), ("a", 3.0, 5.0))) ===
      Seq(("a", 7L, 3.0)))
    // balanced: values 1,2 weights 1,1 -> cumw(1)=1, 2*1 >= 2 -> lower
    // median = 1 (the lower-median contract)
    assert(wm(Seq(("b", 1.0, 1.0), ("b", 2.0, 1.0))) === Seq(("b", 2L, 1.0)))
  }

  test("duplicate values accumulate as peers (RANGE framing)") {
    // v=5 twice (w 1 each), v=9 once (w 1): at v=5 cumw includes BOTH
    // peers = 2, 2*2 >= 3 -> median 5 regardless of tie order
    assert(wm(Seq(("c", 5.0, 1.0), ("c", 5.0, 1.0), ("c", 9.0, 1.0))) ===
      Seq(("c", 3L, 5.0)))
  }

  test("fractional weights floor to integers; groups are independent") {
    val out = wm(Seq(("d", 1.0, 1.9), ("d", 2.0, 1.2), ("e", 7.0, 3.7)))
    // d: floored weights 1,1 -> lower median 1.0, W=2; e: single value
    assert(out === Seq(("d", 2L, 1.0), ("e", 3L, 7.0)))
  }

  test("negative weights raise instead of silently skewing the median") {
    val e = intercept[Exception] {
      wm(Seq(("f", 1.0, 2.0), ("f", 5.0, -3.0)))
    }
    assert(e.getMessage.contains("negative weight"),
      s"unexpected: ${e.getMessage}")
  }
}
