package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RandomProjectionSpec extends SparkSpec {
  import spark.implicits._

  test("projectExact matches a hand-computed integer dot product") {
    val df = Seq((1L, Seq(0.5f, -0.25f, 1.0f))).toDF("id", "emb")
    val got = RandomProjection.projectExact(df, "id", "emb", d = 3, k = 2)
      .collect().map(r => (r.getInt(1), r.getLong(2))).toMap
    val cents = Seq(5000L, -2500L, 10000L)
    for (k <- 0 until 2) {
      val expected = cents.zipWithIndex
        .map { case (x, j) => x * RandomProjection.sign(k, j) }.sum
      assert(got(k) === expected)
    }
  }

  test("sign matrix is deterministic and roughly balanced") {
    val signs = for (k <- 0 until 8; j <- 0 until 64)
      yield RandomProjection.sign(k, j)
    assert(signs === (for (k <- 0 until 8; j <- 0 until 64)
      yield RandomProjection.sign(k, j))) // stable across calls
    val pos = signs.count(_ == 1L)
    // md5 parity ~ Bernoulli(1/2): 512 draws, expect ~256 ± 5 sigma
    assert(pos > 190 && pos < 320, s"unbalanced sign matrix: $pos/512")
  }

  test("projection preserves relative distances directionally (JL)") {
    // three points: a and b close, a and c far — projected distances
    // must keep the ordering (the JL property at this scale)
    val mk = (base: Float, bump: Float) =>
      (0 until 64).map(i => base + (if (i % 7 == 0) bump else 0f))
    val df = Seq(
      (1L, mk(0.1f, 0.01f)), (2L, mk(0.1f, 0.02f)), (3L, mk(0.9f, 0.5f))
    ).toDF("id", "emb")
    val proj = RandomProjection.projectExact(df, "id", "emb", 64, 8)
      .collect().groupBy(_.getLong(0))
      .map { case (id, rs) =>
        id -> rs.sortBy(_.getInt(1)).map(_.getLong(2))
      }
    def dist2(a: Seq[Long], b: Seq[Long]): Double =
      a.zip(b).map { case (x, y) => val d = (x - y).toDouble; d * d }.sum
    assert(dist2(proj(1L), proj(2L)) < dist2(proj(1L), proj(3L)))
  }
}
