package graft.operators

import graft.SparkSpec

class CollocationsSpec extends SparkSpec {
  import spark.implicits._

  test("lift: exact counts, expected ratio, short docs contribute none") {
    // bigrams: doc1 -> (a b)(b a)(a b), doc2 -> (a b)(b c); doc3 none
    val docs = Seq("a b a b", "a b c", "x").toDF("text")
    val out = Collocations.lift(docs, "text", minCount = 1)
      .orderBy("x", "y").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))
    // uni: a=3 b=3 c=1 x=1 -> N_ug=8; bigrams N_bg=5
    // lift(a,b) = (3/5) / ((3/8)*(3/8)) = 0.6/0.140625 = 4.2667
    assert(out.toSeq === Seq(
      ("a", "b", 3L, 3L, 3L, 4.2667),
      ("b", "a", 1L, 3L, 3L, 1.4222),
      ("b", "c", 1L, 3L, 1L, 4.2667)))
  }

  test("minCount prunes the tail before scoring") {
    val docs = Seq("a b a b", "a b c").toDF("text")
    val out = Collocations.lift(docs, "text", minCount = 2).collect()
    assert(out.map(_.getString(0)).toSeq === Seq("a"))
  }
}
