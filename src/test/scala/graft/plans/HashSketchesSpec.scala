package graft.plans

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.functions.{TextFunctions => T}

/** Native sketch expressions must be bit-identical to the HOF forms. */
class HashSketchesSpec extends SparkSpec {

  private lazy val docs = Tables(spark, "/root/testdata/sf0.001", "documents")

  test("native SimHash64 == HOF simhash on all 500 docs") {
    val diff = docs.select(
      T.simHash64(col("text")).as("a"),
      T.simHash64Hof(col("text")).as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(diff === 0)
  }

  test("native MinHashSignature == HOF minhash on all 500 docs") {
    val diff = docs.select(
      T.minHashSignature(col("text"), 3, 64).as("a"),
      T.minHashSignatureHof(col("text"), 3, 64).as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(diff === 0)
  }

  test("empty doc: minhash sentinel, simhash zero") {
    import spark.implicits._
    val r = Seq("").toDF("text").select(
      T.minHashSignature(col("text"), 3, 4).as("mh"),
      T.simHash64(col("text")).as("sh")).collect().head
    assert(r.getAs[scala.collection.Seq[Long]]("mh").forall(_ == Long.MaxValue))
    assert(r.getAs[Long]("sh") === 0L)
  }
}
