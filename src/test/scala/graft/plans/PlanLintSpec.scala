package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PlanLintSpec extends SparkSpec {
  import spark.implicits._

  private def rules(df: org.apache.spark.sql.DataFrame): Set[String] =
    PlanLint.lint(df).map(_.rule).toSet

  test("clean scans and equi-joins produce no findings") {
    val a = spark.range(100).toDF("id")
    val b = spark.range(100).select(col("id"), (col("id") * 2).as("v"))
    assert(rules(a.join(b, "id").filter(col("v") > 10)) === Set.empty)
  }

  test("cross join flags cartesian-product") {
    // force the true cartesian (a broadcastable side plans as BNLJ,
    // which the linter reports under its own rule)
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val a = spark.range(10).toDF("x")
      val b = spark.range(10).toDF("y")
      assert(rules(a.crossJoin(b)).contains("cartesian-product"))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }

  test("non-equi condition flags nested-loop-join") {
    val a = spark.range(10).toDF("x")
    val b = spark.range(10).toDF("y")
    assert(rules(a.join(b, col("x") < col("y")))
      .contains("nested-loop-join"))
  }

  test("UDF predicate over parquet flags unpushed-filter; plain " +
      "predicate does not") {
    val dir = java.nio.file.Files.createTempDirectory("lint").toString
    spark.range(1000).select(col("id"), (col("id") % 7).as("k"))
      .write.mode("overwrite").parquet(dir)
    val scan = spark.read.parquet(dir)
    val opaque = udf((k: Long) => k == 3L)
    assert(rules(scan.filter(opaque(col("k")))).contains("unpushed-filter"))
    assert(!rules(scan.filter(col("k") === 3)).contains("unpushed-filter"))
  }

  test("every gate query lints clean of cartesian products") {
    // the riders that DO crossJoin are 1-row broadcast frames by
    // design; everything else must be cartesian-free. Known 1-row or
    // derived-dimension riders are exempted explicitly so a new
    // accidental cartesian can't hide behind the list.
    val exempt = Set("q23_corr_scalar", "t03_langid", "f04_gap_fill",
      "d01_exact_dedup_docs", "q19_text_stats", "w07_set_ops")
    val dir = "/root/testdata/sf0.001"
    val offenders = graft.SparkEntry.queries.toSeq
      .filterNot { case (name, _) => exempt(name) }
      .flatMap { case (name, fn) =>
        val found = try rules(fn(spark, dir)) catch {
          case _: Throwable => Set.empty[String] // lint is best-effort
        }
        if (found.contains("cartesian-product")) Some(name) else None
      }
    assert(offenders.isEmpty, s"cartesian products in: $offenders")
  }
}
