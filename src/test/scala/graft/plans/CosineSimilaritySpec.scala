package graft.plans

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.operators.VectorOps

class CosineSimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("native expression == HOF form bit-identically on real embeddings") {
    val e = Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val q = e.filter(col("vec_id") === 1).select(col("embedding").as("qe"))
    val both = e.crossJoin(broadcast(q))
      .select(
        VectorOps.cosine(col("embedding"), col("qe")).as("native"),
        VectorOps.cosineHof(col("embedding"), col("qe")).as("hof"))
      .collect()
    assert(both.length === 500)
    both.foreach { r =>
      // bitwise equality: identical fold order, identical rounding
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0))
        === java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("known values, nulls, mismatched lengths") {
    val df = Seq(
      (Some(Seq(1.0f, 0.0f)), Some(Seq(1.0f, 0.0f))), // identical -> 1
      (Some(Seq(1.0f, 0.0f)), Some(Seq(0.0f, 1.0f))), // orthogonal -> 0
      (Some(Seq(1.0f, 1.0f)), Some(Seq(-1.0f, -1.0f))), // opposite -> -1
      (None, Some(Seq(1.0f))), // null in -> null out
      (Some(Seq(1.0f, 0.0f, 5.0f)), Some(Seq(1.0f, 0.0f)))) // common prefix
      .toDF("a", "b")
    val out = df.select(VectorOps.cosine(col("a"), col("b")).as("c")).collect()
    assert(math.abs(out(0).getDouble(0) - 1.0) < 1e-12)
    assert(math.abs(out(1).getDouble(0)) < 1e-12)
    assert(math.abs(out(2).getDouble(0) + 1.0) < 1e-12)
    assert(out(3).isNullAt(0))
  }

  test("null ELEMENT propagates to null (both eval paths)") {
    // interpreted path
    val df = Seq((Seq(Some(1.0f), None), Seq(Some(1.0f), Some(0.0f))))
      .toDF("a", "b")
    val interp = df.select(VectorOps.cosine(col("a"), col("b")).as("c"))
      .collect().head
    assert(interp.isNullAt(0))
    // codegen path (SQL over a parquet scan keeps the expr in codegen)
    GraftExtensions.register(spark)
    val viaSql = df.selectExpr("cosine_sim(a, b) AS c").collect().head
    assert(viaSql.isNullAt(0))
  }

  test("SQL registration: cosine_sim callable from plain SQL") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT cosine_sim(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)), " +
        "array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)))")
      .collect().head.getDouble(0)
    assert(math.abs(r - 1.0) < 1e-12)
  }
}
