package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Bucketed-table co-located joins: same-bucketed tables must join with
  * NO shuffle on either side. */
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

    val joined = spark.table("b_orders")
      .join(spark.table("b_lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderkey")
      .agg(sum("l_extendedprice").as("s"))
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join must not shuffle:\n$plan")

    // correctness: same result as the plain (shuffling) join
    val plain = orders.select("o_orderkey")
      .join(lineitem, col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderkey").agg(sum("l_extendedprice").as("s"))
    assert(joined.exceptAll(plain).count() === 0)
    assert(plain.exceptAll(joined).count() === 0)
  }
}
