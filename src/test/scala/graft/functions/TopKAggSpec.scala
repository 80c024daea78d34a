package graft.functions

import scala.util.Random

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

class TopKAggSpec extends SparkSpec {
  import spark.implicits._

  test("TopKAgg == window row_number formulation on random data") {
    val rnd = new Random(3)
    val rows = (1 to 500).map { i =>
      (rnd.nextInt(7).toLong, rnd.nextInt(50).toLong, i.toLong)
    }
    val df = rows.toDF("g", "score", "id").repartition(8)
    val topk = udaf(new TopKAgg(3), ExpressionEncoder[(Long, Long)]())
    val got = df.groupBy("g").agg(topk(col("score"), col("id")).as("ids"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toList).toMap
    val w = Window.partitionBy("g")
      .orderBy(col("score").desc, col("id"))
    val expected = df.select(col("g"), col("id"),
        row_number().over(w).as("rn"))
      .filter(col("rn") <= 3)
      .collect().groupBy(_.getLong(0))
      .map { case (g, rs) =>
        g -> rs.sortBy(_.getInt(2)).map(_.getLong(1)).toList
      }
    assert(got === expected)
  }

  test("buffer stays bounded at k and ties break on id") {
    val agg = new TopKAgg(2)
    val buf = Seq(5L, 5L, 5L, 1L).zipWithIndex
      .map { case (s, i) => (s, i.toLong + 10) }
      .foldLeft(agg.zero)(agg.reduce)
    assert(buf.length === 2)
    assert(agg.finish(buf) === Seq(10L, 11L)) // score 5 ties -> lowest ids
  }

  test("merge is commutative") {
    val agg = new TopKAgg(3)
    val a = Seq((9L, 1L), (5L, 2L))
    val b = Seq((7L, 3L), (5L, 1L), (3L, 9L))
    assert(agg.merge(a, b) === agg.merge(b, a))
    assert(agg.merge(a, b).map(_._2) === Seq(1L, 3L, 1L))
  }
}
