package graft.operators

import graft.SparkSpec

class KneserNeySpec extends SparkSpec {

  test("hand-computed interpolated KN with D=0.75") {
    import spark.implicits._
    // bigram types: (x,y) (z,y) (x,w); c(x·)=2 fan(x)=2, c(z·)=1
    // fan(z)=1; cont(y)=2 cont(w)=1; T=3
    //   P(y|x) = 0.25/2 + (0.75*2/2)*(2/3) = 0.625
    //   P(y|z) = 0.25/1 + (0.75*1/1)*(2/3) = 0.75
    //   P(w|x) = 0.25/2 + (0.75*2/2)*(1/3) = 0.375
    val docs = Seq((1L, "x y"), (2L, "z y"), (3L, "x w"))
      .toDF("doc_id", "text")
    val out = TextRank.kneserNeyBigram(docs, "doc_id", "text")
      .orderBy("doc")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        math.rint(r.getDouble(2) * 1e4) / 1e4))
      .toSeq
    assert(out === Seq(
      (1L, 1L, math.rint(-math.log(0.625) * 1e4) / 1e4),
      (2L, 1L, math.rint(-math.log(0.75) * 1e4) / 1e4),
      (3L, 1L, math.rint(-math.log(0.375) * 1e4) / 1e4)))
  }

  test("continuation smoothing: versatile word beats locked collocation") {
    import spark.implicits._
    // "f" appears 4x but ONLY after "san" (cont=1); "v" appears twice
    // after different predecessors (cont=2). In a fresh context "q",
    // KN's continuation term must rank v above f.
    val docs = Seq(
      (1L, "san f san f san f san f"),
      (2L, "a v"), (3L, "b v"),
      (4L, "q f"), (5L, "q v"))
      .toDF("doc_id", "text")
    val out = TextRank.kneserNeyBigram(docs, "doc_id", "text")
      .filter("doc >= 4").orderBy("doc")
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toMap
    // lower score = higher probability; doc 5 ("q v") must score lower
    assert(out(5L) < out(4L))
  }
}
