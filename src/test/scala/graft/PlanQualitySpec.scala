package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode

import graft.queries.CoreQueries

/** Physical-plan assertions: the plans the engine produces are the plans
  * we'd want at 100 TB — filters pushed to the scan, columns pruned,
  * dimension joins broadcast, top-k as TakeOrderedAndProject, codegen on
  * the hot path. Guards against regressions that stay correct but stop
  * scaling.
  */
class PlanQualitySpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    CoreQueries.queries(name)(spark, dir)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))

  test("q02: predicates pushed to the parquet scan") {
    val p = plan("q02_filter")
    assert(p.contains("PushedFilters:"), p)
    assert(p.contains("IsNotNull(o_orderstatus)") ||
      p.contains("EqualTo(o_orderstatus,F)"), p)
    assert(p.contains("GreaterThan(o_totalprice,1000.0)"), p)
  }

  test("q01: column pruning — scan reads only the projected columns") {
    val p = plan("q01_scan_project")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema:")).get
    assert(readSchema.contains("r_regionkey") && readSchema.contains("r_name"))
  }

  test("q47: KmvAgg aggregates partially BEFORE the shuffle — the " +
    "k-bounded-state claim is in the physical plan, not just prose") {
    import org.apache.spark.sql.functions.{col, lit}
    val sk = graft.operators.KmvSketch.sketchBy(
      spark.range(1000).selectExpr("CAST(id % 7 AS STRING) AS shard",
        "id AS v"),
      col("v"), 16, col("shard"))
    val p = sk.queryExecution
      .explainString(ExplainMode.fromString("formatted"))
    // partial_kmvagg must run BEFORE the exchange: each map task ships
    // at most k longs per group, never its raw rows. The formatted
    // plan numbers operators bottom-up, so the partial aggregate's
    // node id must be smaller than the shuffle's.
    assert(p.contains("partial_kmvagg"), s"no partial kmvagg in plan:\n$p")
    val lines = p.linesIterator.toSeq
    val aggIds = lines.filter(_.contains("ObjectHashAggregate (")).map(
      _.trim.replaceAll(".*\\((\\d+)\\).*", "$1").toInt)
    val exIds = lines.filter(_.contains("Exchange (")).map(
      _.trim.replaceAll(".*\\((\\d+)\\).*", "$1").toInt)
    assert(aggIds.nonEmpty && exIds.nonEmpty, p)
    assert(aggIds.min < exIds.min,
      s"partial aggregate (${aggIds.min}) must precede the exchange " +
        s"(${exIds.min}):\n$p")
  }

  test("q04/q16: dimension joins are broadcast hash joins, not SMJ") {
    for (q <- Seq("q04_dim_join", "q16_fact_join")) {
      val p = plan(q)
      assert(p.contains("BroadcastHashJoin"), s"$q:\n$p")
    }
    // the nation dim must never arrive via sort-merge
    assert(!plan("q04_dim_join").contains("SortMergeJoin"))
  }

  test("q07: top-k compiles to TakeOrderedAndProject (no global sort)") {
    val p = plan("q07_topk")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q05: partial (map-side) aggregation before the shuffle") {
    val p = plan("q05_grouped_agg")
    assert(p.contains("HashAggregate"), p)
    // partial + final pairs: two HashAggregate nodes around one exchange
    assert("HashAggregate".r.findAllIn(p).length >= 2, p)
  }

  test("q02/q05: hot path inside WholeStageCodegen") {
    // AQE hides codegen until the adaptive plan finalizes — execute,
    // then inspect the executed plan
    for (q <- Seq("q02_filter", "q05_grouped_agg")) {
      val df = CoreQueries.queries(q)(spark, dir)
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      // "*(n)" node prefixes mark WholeStageCodegen stages
      assert(p.contains("*("), s"$q:\n$p")
    }
  }

  test("q22: EXISTS is rewritten to a semi join — no per-row subquery") {
    val p = plan("q22_exists_semi")
    assert(p.contains("LeftSemi"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q23: correlated scalar subquery is decorrelated into agg + join") {
    val p = plan("q23_corr_scalar")
    // decorrelation = the per-part average becomes an aggregate joined
    // back on l_partkey; a surviving correlated subquery would show as
    // a nested-loop / cartesian shape
    assert(p.contains("HashAggregate"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q24: outer join + double aggregation, no nested loops") {
    val p = plan("q24_custdist")
    assert(p.contains("LeftOuter") || p.contains("RightOuter"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("f01: funnel step joins stay equi-keyed — no nested loops") {
    // each step's time inequality rides as a join condition on the
    // user-key equi-join; a planner that lost the equi component would
    // fall back to BNLJ and melt down at event-log scale
    val p = SparkEntry.queries("f01_funnel_steps")(spark, dir)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("t14: inverted index joins on token, no nested loops") {
    val p = SparkEntry.queries("t14_inverted_index")(spark, dir)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
    // df band must filter between the count and the postings collection
    assert(p.contains("HashAggregate") || p.contains("ObjectHashAggregate"), p)
  }

  test("q34/q35: single-scan aggregates — no join, partial+final") {
    for (q <- Seq("q34_argmax", "q35_histogram")) {
      val p = plan(q)
      assert(!p.contains("Join"), s"$q:\n$p")
      assert("HashAggregate".r.findAllIn(p).length >= 2, s"$q:\n$p")
    }
  }

  test("src01: location pruning plans one partition per surviving " +
      "location, predicates pushed") {
    import org.apache.spark.sql.functions.col
    val scan = spark.read.format("square-orders")
      .load(graft.GraftSession.fixture("square_orders_v2"))
      .filter(col("location_id").isin("LOC_A", "LOC_B") &&
        col("state") === "COMPLETED")
    // S4: LOC_C's file is pruned at planning — 2 InputPartitions, not 3
    assert(scan.rdd.getNumPartitions == 2, scan.rdd.getNumPartitions)
    val p = scan.queryExecution
      .explainString(ExplainMode.fromString("formatted"))
    // S2: the scan's description carries the pushed predicate set
    assert(p.contains("In(location_id") || p.contains("EqualTo(state"), p)
  }

  test("d16: dedup-pipeline census joins stay equi-keyed") {
    val p = SparkEntry.queries("d16_dedup_pipeline")(spark, dir)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("sales ETL: broadcast dim join + no shuffle before the write") {
    import spark.implicits._
    val orders = graft.sources.SquareOrders.fromJson(spark,
      spark.createDataset(Seq(
        """{"id":"o1","location_id":"L5WST6KFZBT10",
          |"closed_at":"2025-11-24T13:27:45Z","line_items":[
          |{"name":"X","quantity":"1","base_price_money":{"amount":100},
          |"gross_sales_money":{"amount":100}}]}""".stripMargin.replace("\n", ""))))
    val locations = Seq((2, "Current", "L5WST6KFZBT10"))
      .toDF("id", "name", "square_id")
    val qe = graft.operators.SalesEtl.run(orders, locations).queryExecution
    val p = qe.explainString(ExplainMode.fromString("formatted"))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    // toString, not formatted: formatted splits the node name from its
    // hashpartitioning argument, making the phrase-match vacuous
    val classic = qe.executedPlan.toString
    assert(!classic.contains("Exchange hashpartitioning"), classic)
  }
}
