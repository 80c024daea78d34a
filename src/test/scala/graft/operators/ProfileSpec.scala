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

  test("single pass: one scan, stack-generated, hash-aggregated dedup") {
    val df = Seq((1L, "a", 2.0)).toDF("x", "y", "z")
    val plan = Profile.profile(df, Seq("x", "y", "z"))
      .queryExecution.executedPlan.toString
    // one generator over ONE scan (not one job per column)...
    assert(plan.contains("Generate"), plan)
    assert("LocalTableScan".r.findAllIn(plan).size === 1, plan)
    // ...and the value-dedup level is a two-phase HASH aggregate: the
    // naive multi-countDistinct form plans the whole expanded input
    // through SortAggregate (string min/max buffers are immutable),
    // measured 12x slower at sf0.1
    assert(plan.contains("HashAggregate"), plan)
  }

  test("null-only and duplicate-heavy columns profile correctly") {
    val df = Seq(
      (Option.empty[Long], "x"), (None, "x"), (None, "x"))
      .toDF("k", "v")
    val got = Profile.profile(df, Seq("k", "v"))
      .select("col_name", "n_nulls", "n_distinct", "min_s", "max_s")
      .as[(String, Long, Long, Option[String], Option[String])]
      .collect().toSet
    assert(got === Set(
      ("k", 3L, 0L, None, None),
      ("v", 0L, 1L, Some("x"), Some("x"))))
  }
}
