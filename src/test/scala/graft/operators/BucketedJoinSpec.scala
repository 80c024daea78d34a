package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Bucketed-table co-located joins: same-bucketed tables must join with
  * NO shuffle on either side — the physical layout contract explicit
  * bucketing buys at 100 TB (each bucket pair joins in place). */
class BucketedJoinSpec extends SparkSpec {

  private def rmTree(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(rmTree)
    f.delete()
  }

  test("join of two same-bucketed tables has no Exchange") {
    val dir = "/root/testdata/sf0.001"
    // in-memory catalog forgets managed tables across JVMs but their
    // warehouse directories persist — clear both
    for (t <- Seq("b_orders", "b_lineitem")) {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val d = new java.io.File(s"spark-warehouse/$t")
      if (d.exists()) rmTree(d)
    }
    val orders = Tables(spark, dir, "orders")
    val lineitem = Tables(spark, dir, "lineitem")
      .select("l_orderkey", "l_extendedprice")
    SalesSink.writeBucketed(orders.select("o_orderkey", "o_totalprice"),
      "b_orders", "o_orderkey", 8)
    SalesSink.writeBucketed(lineitem, "b_lineitem", "l_orderkey", 8)

    // force the sort-merge path: a broadcast join would trivially have
    // no exchange without proving bucket co-location
    val prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("b_orders")
        .join(spark.table("b_lineitem"),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderkey")
        .agg(sum("l_extendedprice").as("s"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")
      assert(plan.contains("SortMergeJoin"), plan)

      // correctness: same result as the plain (shuffling) join
      val plain = orders.select("o_orderkey")
        .join(lineitem, col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderkey").agg(sum("l_extendedprice").as("s"))
      assert(joined.exceptAll(plain).count() === 0)
      assert(plain.exceptAll(joined).count() === 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
    }
  }

  test("non-bucketed control plans a shuffle (the claim is real)") {
    import spark.implicits._
    val l = (1L to 1000L).map(i => (i % 100, i)).toDF("k", "lv")
    val r = (0L until 100L).map(i => (i, s"n$i")).toDF("k", "rv")
    val joined = l.join(r, "k").groupBy("k").agg(count(lit(1)))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("Exchange hashpartitioning"), plan)
  }
}
