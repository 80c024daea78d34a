package graft.operators

import graft.SparkSpec

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  test("nulls, exact distincts, and string-rendered min/max per column") {
    val df = Seq(
      (Some(1L), Some("a")), (Some(2L), None),
      (Some(2L), Some("b")), (None, Some("a")))
      .toDF("k", "v")
    val got = Profile.profile(df, Seq("k", "v"))
      .select("col_name", "n_nulls", "n_distinct", "min_s", "max_s")
      .as[(String, Long, Long, String, String)].collect().toSet
    assert(got === Set(
      ("k", 1L, 2L, "1", "2"),
      ("v", 1L, 2L, "a", "b")))
  }

  test("all columns profile in a single pass (one scan, Expand-planned)") {
    val df = Seq((1L, "a", 2.0)).toDF("x", "y", "z")
    val plan = Profile.profile(df, Seq("x", "y", "z"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("Expand"), plan)
    assert("LocalTableScan".r.findAllIn(plan).size === 1, plan)
  }
}
