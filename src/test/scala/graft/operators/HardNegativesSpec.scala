package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class HardNegativesSpec extends SparkSpec {
  import spark.implicits._

  // query 0 points along +x; negatives at known angles
  private lazy val emb = Seq(
    (0L, Seq(1f, 0f), 0),
    (1L, Seq(1f, 0f), 0),       // same label: never a negative
    (2L, Seq(1f, 0.001f), 1),   // nearly parallel -> hardest negative
    (3L, Seq(1f, 1f), 1),       // 45 degrees
    (4L, Seq(0f, 1f), 1),       // orthogonal
    (5L, Seq(-1f, 0f), 2)       // opposite
  ).toDF("vec_id", "embedding", "label")

  test("hardNegatives: other-label only, ranked by similarity") {
    val out = SimilaritySearch.hardNegatives(emb, "vec_id", "embedding",
        "label", col("vec_id") === 0, k = 3)
      .orderBy("rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
        r.getInt(4)))
    assert(out.toSeq === Seq((0L, 2L, 1, 1), (0L, 3L, 1, 2), (0L, 4L, 1, 3)))
  }

  test("hardNegatives: k bounds each query's list; multiple queries") {
    val out = SimilaritySearch.hardNegatives(emb, "vec_id", "embedding",
        "label", col("vec_id") <= 1, k = 2)
    assert(out.count() === 4L) // 2 queries x 2 negatives
    assert(out.filter(col("neg_label") === 0).count() === 0L)
  }
}
