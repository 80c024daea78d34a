package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class AbTestSpec extends SparkSpec {
  import spark.implicits._

  test("counts, ppm rates, lift, and pooled z are exact") {
    // A: 4 users / 1 conversion, B: 4 users / 3 conversions
    val users = Seq(
      (false, true), (false, false), (false, false), (false, false),
      (true, true), (true, true), (true, true), (true, false))
      .toDF("variant", "converted")
    val r = AbTest.proportionTest(users, col("variant"), col("converted"))
      .head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((4L, 1L, 250000L)))
    assert((r.getLong(3), r.getLong(4), r.getLong(5)) === ((4L, 3L, 750000L)))
    assert(r.getLong(6) === 500000L)
    // z = (0.75 - 0.25) / sqrt(0.5 * 0.5 * (1/4 + 1/4)) = sqrt(2)
    assert(r.getDouble(7) === 1.4142)
  }

  test("degenerate pools and empty arms yield NULL z, not a crash") {
    // everyone converts: pooled variance 0
    val all = Seq((false, true), (true, true)).toDF("v", "c")
    assert(AbTest.proportionTest(all, col("v"), col("c")).head().isNullAt(7))
    // one arm empty
    val oneArm = Seq((true, true), (true, false)).toDF("v", "c")
    val r = AbTest.proportionTest(oneArm, col("v"), col("c")).head()
    assert(r.getLong(0) === 0L && r.isNullAt(7))
  }

  test("NULL variant rows are excluded; NULL converted counts as false") {
    val users = Seq((Some(false), Some(true)), (None, Some(true)),
      (Some(true), None), (Some(true), Some(true)))
      .toDF("v", "c")
    val r = AbTest.proportionTest(users, col("v"), col("c")).head()
    assert(r.getLong(0) === 1L && r.getLong(1) === 1L) // the null-v row gone
    assert(r.getLong(3) === 2L && r.getLong(4) === 1L) // null c = no conv
  }
}
