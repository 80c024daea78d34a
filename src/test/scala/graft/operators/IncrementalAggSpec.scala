package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class IncrementalAggSpec extends SparkSpec {
  import spark.implicits._

  private lazy val orders = Tables(spark, "/root/testdata/sf0.001", "orders")

  private def asMap(df: org.apache.spark.sql.DataFrame) =
    df.select(col("o_custkey"), col("cnt"),
      col("total").cast("string"))
      .as[(Long, Long, String)].collect()
      .map { case (k, c, t) => k -> ((c, t)) }.toMap

  test("merged batch partials equal a full recompute, bit-identical") {
    val full = asMap(IncrementalAgg.partial(
      orders, Seq("o_custkey"), col("o_totalprice")))
    val even = IncrementalAgg.partial(
      orders.filter(pmod($"o_orderkey", lit(2)) === 0),
      Seq("o_custkey"), $"o_totalprice")
    val odd = IncrementalAgg.partial(
      orders.filter(pmod($"o_orderkey", lit(2)) === 1),
      Seq("o_custkey"), $"o_totalprice")
    assert(asMap(IncrementalAgg.merge(Seq("o_custkey"), even, odd)) === full)
  }

  test("distinct sketches: merged batch states == full-recompute estimate " +
      "exactly, and near the exact distinct") {
    val li = Tables(spark, "/root/testdata/sf0.001", "lineitem")
    def est(df: org.apache.spark.sql.DataFrame) =
      df.select(col("l_returnflag"), col("approx_nd"))
        .as[(String, Long)].collect().toMap
    val batches = (0 until 3).map(i => IncrementalAgg.distinctPartial(
      li.filter(pmod($"l_orderkey", lit(3)) === i),
      Seq("l_returnflag"), $"l_partkey"))
    val merged = est(IncrementalAgg.distinctMerge(
      Seq("l_returnflag"), batches: _*))
    val full = est(IncrementalAgg.distinctMerge(Seq("l_returnflag"),
      IncrementalAgg.distinctPartial(li, Seq("l_returnflag"),
        $"l_partkey")))
    assert(merged === full) // register merge is exact, not approximate
    val exact = li.groupBy("l_returnflag")
      .agg(countDistinct($"l_partkey").as("nd"))
      .as[(String, Long)].collect().toMap
    merged.foreach { case (k, e) =>
      assert(math.abs(e - exact(k)).toDouble / exact(k) < 0.05,
        s"$k: est $e vs exact ${exact(k)}")
    }
  }

  test("merge is associative: state ⊕ delta re-merges to the same result") {
    val batches = (0 until 3).map(i => IncrementalAgg.partial(
      orders.filter(pmod($"o_orderkey", lit(3)) === i),
      Seq("o_custkey"), $"o_totalprice"))
    val allAtOnce = IncrementalAgg.merge(Seq("o_custkey"), batches: _*)
    val rolling = batches.reduce((s, d) =>
      IncrementalAgg.merge(Seq("o_custkey"), s, d))
    assert(asMap(rolling) === asMap(allAtOnce))
    // merged state has the partial's schema — can be stored and re-merged
    assert(rolling.schema.fieldNames.toSeq ===
      batches.head.schema.fieldNames.toSeq)
  }

  test("a key absent from one batch still merges correctly") {
    val a = IncrementalAgg.partial(
      Seq((1L, 10.0), (2L, 5.0)).toDF("k", "v"), Seq("k"), $"v")
    val b = IncrementalAgg.partial(
      Seq((2L, 7.0)).toDF("k", "v"), Seq("k"), $"v")
    val m = asMap(IncrementalAgg.merge(Seq("k"), a, b)
      .withColumnRenamed("k", "o_custkey"))
    assert(m(1L) === ((1L, "10.0000")))
    assert(m(2L) === ((2L, "12.0000")))
  }
}
