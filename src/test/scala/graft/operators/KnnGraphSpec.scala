package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class KnnGraphSpec extends SparkSpec {

  private def corpus(n: Int) = {
    import spark.implicits._
    // deterministic spread of unit-ish vectors in 8 dims
    (1L to n.toLong).map { i =>
      i -> (0 until 8).map(j =>
        math.sin(i * 0.7 + j * 1.3).toFloat).toSeq
    }.toDF("vec_id", "embedding")
  }

  test("every edge links bucket-mates and ranks are dense per id") {
    val g = SimilaritySearch.knnGraph(corpus(60), "vec_id", "embedding",
      dim = 8, k = 3, planes = 2, tables = 2)
    val rows = g.collect()
    assert(rows.nonEmpty)
    val byId = rows.groupBy(_.getLong(0))
    byId.foreach { case (_, rs) =>
      val ranks = rs.map(_.getInt(1)).sorted.toSeq
      assert(ranks === (1 to ranks.length)) // dense 1..m, m <= k
      assert(ranks.length <= 3)
      // ranked by rounded cosine desc, ties by nb asc
      val ordered = rs.sortBy(_.getInt(1))
        .map(r => (-r.getDouble(3), r.getLong(2))).toSeq
      assert(ordered === ordered.sorted)
    }
    // no self-edges
    assert(rows.forall(r => r.getLong(0) != r.getLong(2)))
  }

  test("kNN graph finds planted near-duplicates as rank-1 neighbors") {
    import spark.implicits._
    val base = corpus(40)
    val dups = base.filter(col("vec_id") <= 5)
      .select((col("vec_id") + 1000).as("vec_id"),
        transform(col("embedding"),
          x => (x * lit(1.0001f)).cast("float")).as("embedding"))
    val g = SimilaritySearch.knnGraph(base.unionByName(dups), "vec_id",
      "embedding", dim = 8, k = 3, planes = 2, tables = 2)
    val nn1 = g.filter(col("id") <= 5 && col("rank") === 1)
      .select("id", "nb").as[(Long, Long)].collect().toMap
    // a scaled copy shares every bucket (same sign pattern) and has
    // cosine ~1 -> it must surface as the original's top neighbor
    (1L to 5L).foreach(i => assert(nn1(i) === i + 1000))
  }
}
