package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class HyperLogLogSpec extends SparkSpec {
  import spark.implicits._

  private def est(df: org.apache.spark.sql.DataFrame): Double =
    HyperLogLog.distinctEstimate(df, col("v"), b = 10)
      .head().getAs[Double]("est")

  test("estimate lands within the expected band of the exact count") {
    // 1000 distinct values: md5 is fixed, so the estimate is one
    // deterministic number; standard error ~1.04/sqrt(1024) = 3.25%
    val df = (1L to 1000L).toDF("v")
    val e = est(df)
    assert(math.abs(e - 1000) / 1000.0 < 0.10, s"estimate $e vs 1000")
  }

  test("duplicates do not move the estimate (cardinality, not count)") {
    val distinct = (1L to 500L).toDF("v")
    val dup = ((1L to 500L) ++ (1L to 500L) ++ (1L to 100L)).toDF("v")
    assert(est(distinct) === est(dup))
  }

  test("registers merge by max: sharded == whole-corpus sketch") {
    val a = (1L to 600L).toDF("v")
    val b = (400L to 1200L).toDF("v") // overlap: merge must not double
    val whole = ((1L to 600L) ++ (400L to 1200L)).toDF("v")
    val merged = HyperLogLog.registers(a, col("v"), 10)
      .unionByName(HyperLogLog.registers(b, col("v"), 10))
      .groupBy("j").agg(max(col("r")).as("r"))
    val mergedEst = HyperLogLog.estimate(merged, 10)
      .head().getAs[Double]("est")
    assert(mergedEst === est(whole))
  }

  test("empty input estimates zero via the linear-counting branch") {
    val out = HyperLogLog.distinctEstimate(
      Seq.empty[Long].toDF("v"), col("v"), b = 10).head()
    assert(out.getAs[Long]("occupied") === 0L)
    assert(out.getAs[Double]("est") === 0.0)
  }
}
