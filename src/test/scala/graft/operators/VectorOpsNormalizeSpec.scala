package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class VectorOpsNormalizeSpec extends SparkSpec {
  import spark.implicits._

  private def vecs(vs: Seq[Seq[Float]]) =
    vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")

  test("l2Normalize: unit norm, direction preserved, zero passthrough") {
    val df = vecs(Seq(Seq(3f, 4f), Seq(0f, 0f), Seq(-2f, 0f)))
      .select(col("id"), VectorOps.l2Normalize(col("v")).as("y"))
    val got = df.as[(Long, Seq[Double])].collect().sortBy(_._1).map(_._2)
    assert(got(0).map(x => math.round(x * 1e6)) === Seq(600000L, 800000L))
    assert(got(1) === Seq(0.0, 0.0)) // zero vector unchanged, not NaN
    assert(got(2) === Seq(-1.0, 0.0))
  }

  test("matryoshka: truncates then re-normalizes the prefix") {
    // prefix (1,2) of (1,2,2) must renormalize to 1/sqrt(5), 2/sqrt(5)
    val df = vecs(Seq(Seq(1f, 2f, 2f)))
      .select(VectorOps.matryoshka(col("v"), 2).as("y"))
    val Seq(y) = df.as[Seq[Double]].collect().toSeq
    assert(y.length === 2)
    val n = math.sqrt(y.map(x => x * x).sum)
    assert(math.abs(n - 1.0) < 1e-12)
    assert(math.abs(y(1) / y(0) - 2.0) < 1e-12)
  }

  test("matryoshka with dims >= length is plain normalization") {
    val a = VectorOps.matryoshka(col("v"), 8)
    val b = VectorOps.l2Normalize(col("v"))
    val df = vecs(Seq(Seq(1f, 2f, 3f))).select(a.as("a"), b.as("b"))
    val (x, y) = df.as[(Seq[Double], Seq[Double])].head()
    assert(x === y)
  }

  test("binarizeWord: strictly-positive dims set their bit, offset slices") {
    // 64-dim vector: dim 0 positive (bit 0 of w1), dim 1 zero and dim 2
    // negative (unset — strict > 0), dim 31 positive (bit 31, the sign
    // boundary of an int: must land exactly, 2^31), dim 32 positive
    // (bit 0 of w2), dim 63 positive (bit 31 of w2)
    val v = Array.fill(64)(0f)
    v(0) = 1f; v(1) = 0f; v(2) = -3f; v(31) = 0.5f; v(32) = 2f; v(63) = 1f
    val df = vecs(Seq(v.toSeq))
      .select(VectorOps.binarizeWord(col("v"), 0).as("w1"),
        VectorOps.binarizeWord(col("v"), 32).as("w2"))
    val (w1, w2) = df.as[(Long, Long)].head()
    assert(w1 === (1L | (1L << 31)))
    assert(w2 === (1L | (1L << 31)))
  }
}
