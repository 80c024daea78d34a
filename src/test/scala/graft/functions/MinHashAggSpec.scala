package graft.functions

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.functions.{TextFunctions => T}

class MinHashAggSpec extends SparkSpec {
  import spark.implicits._

  test("group signature == signature of the union (element-wise min)") {
    val docs = Seq(
      ("a", "one two three four five"),
      ("a", "four five six seven eight"),
      ("b", "nine ten eleven twelve thirteen"))
      .toDF("grp", "text")
    val sigs = docs.select(col("grp"),
      T.minHashSignature(col("text"), 3, 32).as("sig"))
      .as[(String, Seq[Long])]
    val grouped = sigs.groupByKey(_._1).mapValues(_._2)
      .agg(new MinHashAgg(32).toColumn.name("gsig"))
      .collect().toMap
    val perDoc = sigs.collect()
    val expectedA = perDoc.filter(_._1 == "a").map(_._2)
      .reduce((x, y) => x.zip(y).map { case (p, q) => math.min(p, q) })
    assert(grouped("a") === expectedA)
    assert(grouped("b") === perDoc.filter(_._1 == "b").head._2)
  }

  test("estimated jaccard between group sketches tracks real overlap") {
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
    val sigs = docs
      .select((col("doc_id") % 2).as("grp"),
        T.minHashSignature(col("text"), 3, 64).as("sig"))
      .as[(Long, Seq[Long])]
    val bySrc = sigs.groupByKey(_._1).mapValues(_._2)
      .agg(new MinHashAgg(64).toColumn.name("gsig"))
      .collect().toMap
    val j = MinHashAgg.estimateJaccard(bySrc(0L), bySrc(1L))
    assert(j >= 0.0 && j <= 1.0)
  }
}
