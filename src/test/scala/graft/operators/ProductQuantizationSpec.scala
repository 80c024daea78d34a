package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ProductQuantizationSpec extends SparkSpec {
  import spark.implicits._
  import ProductQuantization.{Codebooks, adcTopK, adcTopKCodes, encode, train}

  // hand-built codebooks: dim 4, m 2, ksub 2 — subspace 0 centroids
  // (0,0)/(10,10), subspace 1 centroids (0,0)/(−10,−10)
  private val cb = Codebooks(4, 2, Vector(
    Vector(Vector(0f, 0f), Vector(10f, 10f)),
    Vector(Vector(0f, 0f), Vector(-10f, -10f))))

  test("encode picks the nearest centroid per subspace, ties to low code") {
    val emb = Seq(
      (1L, Seq(0.1f, -0.1f, 0.2f, 0.1f)),   // near (0,0) | near (0,0)
      (2L, Seq(9f, 11f, -9f, -11f)),        // near (10,10) | near (-10,-10)
      (3L, Seq(5f, 5f, -5f, -5f))           // exact midpoints -> ties -> 0
    ).toDF("vec_id", "embedding")
    val got = encode(emb, "vec_id", "embedding", cb)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toList).toMap
    assert(got(1L) === List(0, 0))
    assert(got(2L) === List(1, 1))
    assert(got(3L) === List(0, 0)) // equidistant: lowest code wins
  }

  test("ADC equals exact squared L2 when vectors sit ON codebook entries") {
    val emb = Seq(
      (1L, Seq(0f, 0f, 0f, 0f)),
      (2L, Seq(10f, 10f, 0f, 0f)),
      (3L, Seq(10f, 10f, -10f, -10f))).toDF("vec_id", "embedding")
    val q = Seq(1f, 1f, -1f, -1f)
    val got = adcTopK(emb, "vec_id", "embedding", cb, q, 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // vec1 -> codes (0,0): d = (1²+1²) + (1²+1²) = 4
    // vec2 -> codes (1,0): d = (9²+9²) + 2 = 164
    // vec3 -> codes (1,1): d = 162 + (9²+9²) = 324
    assert(got(1L) === 4.0)
    assert(got(2L) === 164.0)
    assert(got(3L) === 324.0)
  }

  test("adcTopKCodes ranks by adc asc with id tiebreak and honors k") {
    val codes = Seq((5L, Seq(0, 0)), (2L, Seq(0, 0)), (9L, Seq(1, 1)))
      .toDF("id", "codes")
    val got = adcTopKCodes(codes, cb, Seq(0f, 0f, 0f, 0f), 2)
      .select("id").as[Long].collect().toList
    assert(got === List(2L, 5L)) // equal adc -> id order; k=2 cuts 9
  }

  test("adcTopKCodes drops undecodable code rows instead of erroring " +
    "or ranking them first") {
    // short array, null element, out-of-range code, null codes: all
    // yield null adc (the AdcSum null discipline — the HOF element_at
    // form threw under ANSI on a bad code) and are filtered before the
    // NULLS FIRST asc sort can hand them rank 1
    val codes = Seq(
      (1L, Some(Seq(Some(0), Some(0)))),
      (2L, Some(Seq(Some(0)))),
      (3L, Some(Seq(Some(0), None))),
      (4L, Some(Seq(Some(0), Some(7)))),
      (5L, Option.empty[Seq[Option[Int]]])
    ).toDF("id", "codes")
    val got = adcTopKCodes(codes, cb, Seq(0f, 0f, 0f, 0f), 10)
      .select("id").as[Long].collect().toList
    assert(got === List(1L))
  }

  test("train recovers two planted clusters per subspace and encode " +
    "separates them") {
    // subspace clusters: first half near (0,0) or (8,8); second half
    // near (0,0) or (-8,-8) — independent combinations across docs
    val rows = (0 until 40).map { i =>
      val a = if (i % 2 == 0) 0f else 8f
      val b = if (i / 20 == 0) 0f else -8f
      val eps = (i % 5) * 0.01f
      (i.toLong, Seq(a + eps, a - eps, b + eps, b - eps))
    }
    val emb = rows.toDF("vec_id", "embedding")
    val learned = train(emb, "vec_id", "embedding", dim = 4, m = 2,
      ksub = 2, iters = 5)
    // each subspace's two centroids land near the planted means
    for (j <- 0 until 2) {
      val cents = learned.centroids(j).map(_.map(_.toDouble).sum / 2)
      val sorted = cents.sorted
      val expect = if (j == 0) List(0.0, 8.0) else List(-8.0, 0.0)
      sorted.zip(expect).foreach { case (gotC, exp) =>
        assert(math.abs(gotC - exp) < 0.5, s"subspace $j centroids $cents")
      }
    }
    // same-cluster rows share codes; cross-cluster rows differ
    val enc = encode(emb, "vec_id", "embedding", learned)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toList).toMap
    assert(enc(0L)(0) === enc(2L)(0)) // both a=0 in subspace 0
    assert(enc(0L)(0) !== enc(1L)(0)) // a=0 vs a=8
    assert(enc(0L)(1) === enc(10L)(1)) // both b=0 in subspace 1
    assert(enc(0L)(1) !== enc(20L)(1)) // b=0 vs b=-8
  }
}
