package graft.operators

import graft.SparkSpec

class RakeSpec extends SparkSpec {
  import spark.implicits._

  test("keywords: hand-computed degree/freq scores, stopword delimiters") {
    // "alpha beta of alpha": 'of' splits the runs -> phrases
    // "alpha beta" (len 2) and "alpha" (len 1).
    // freq: alpha 2, beta 1; degree: alpha 2+1=3, beta 2.
    // score("alpha beta") = 3/2 + 2/1 = 3.5; score("alpha") = 1.5.
    val docs = Seq((1L, "alpha beta of alpha")).toDF("doc_id", "text")
    val out = Rake.keywords(docs, "doc_id", "text")
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(out === Seq(("alpha beta", 2L, 1L, 3.5),
      ("alpha", 1L, 1L, 1.5)))
  }

  test("repeated phrase texts merge into one row with occurrence count") {
    val docs = Seq((1L, "x y"), (2L, "x y")).toDF("doc_id", "text")
    // freq x=2, y=2; degree x=4, y=4; score = 2 + 2 = 4.0 per occurrence
    val out = Rake.keywords(docs, "doc_id", "text")
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(out === Seq(("x y", 2L, 2L, 4.0)))
  }

  test("all-stopword and empty docs contribute nothing; topK truncates") {
    val docs = Seq((1L, "the of and"), (2L, ""), (3L, "alpha"),
      (4L, "beta"), (5L, "gamma")).toDF("doc_id", "text")
    val out = Rake.keywords(docs, "doc_id", "text", topK = 2)
      .select("phrase").as[String].collect().toSeq
    // three singleton phrases score 1.0 each; text tie-break, k=2
    assert(out === Seq("alpha", "beta"))
  }
}
