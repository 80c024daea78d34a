package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DsirSpec extends SparkSpec {
  import spark.implicits._

  test("importanceTopK: hand-computed smoothed log weights, target excluded") {
    // target (id 0): "alpha beta"; source: id 1 target-like, id 2 not.
    // V=3, Nt=2, Ns=4; p_t(alpha)=(1+1)/(2+3), p_s(alpha)=(1+1)/(4+3):
    //   doc 1 = 2·(ln(2/5) − ln(2/7)) = 2·ln(7/5) → 0.6729
    //   doc 2 = 2·(ln(1/5) − ln(3/7))              → −1.5243
    val docs = Seq((0L, "alpha beta"), (1L, "alpha beta"),
      (2L, "zeta zeta")).toDF("doc_id", "text")
    val out = Dsir.importanceTopK(docs, "doc_id", "text",
      isTarget = col("doc_id") === 0L, k = 10)
      .as[(Long, Long, Double)].collect().toSeq
    assert(out === Seq((1L, 2L, 0.6729), (2L, 2L, -1.5243)))
  }

  test("importanceTopK: top-k truncates on (rounded weight, doc) order") {
    val docs = (Seq((0L, "x y")) ++
      (1L to 5L).map(i => (i, if (i <= 3) "x y" else "q q")))
      .toDF("doc_id", "text")
    val out = Dsir.importanceTopK(docs, "doc_id", "text",
      isTarget = col("doc_id") === 0L, k = 3)
      .select("doc").as[Long].collect().toSeq
    // three target-like docs tie on weight; doc_id breaks the tie
    assert(out === Seq(1L, 2L, 3L))
  }

  test("tokenless and empty source docs are absent") {
    val docs = Seq((0L, "x"), (1L, "x"), (2L, "   ")).toDF("doc_id", "text")
    val out = Dsir.importanceTopK(docs, "doc_id", "text",
      isTarget = col("doc_id") === 0L, k = 10)
      .select("doc").as[Long].collect().toSeq
    assert(out === Seq(1L))
  }
}
