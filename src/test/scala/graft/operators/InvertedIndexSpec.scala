package graft.operators

import graft.SparkSpec

class InvertedIndexSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the cat sat"),
    (2L, "the cat ran"),
    (3L, "THE  dog   ran"), // casing + multi-space normalization
    (4L, "the the the cat") // repeats collapse to one posting
  ).toDF("doc_id", "text")

  test("build: df counts, sorted postings, band filter") {
    val m = InvertedIndex.build(docs, "doc_id", "text")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getString(2)))
      .toMap
    assert(m("the") === (4L, "1,2,3,4"))
    assert(m("cat") === (3L, "1,2,4"))
    assert(m("ran") === (2L, "2,3"))
    assert(m("sat") === (1L, "1"))
    assert(m("dog") === (1L, "3"))
  }

  test("build: maxDf drops head tokens before postings are collected") {
    val m = InvertedIndex.build(docs, "doc_id", "text", minDf = 2L,
      maxDf = 3L).collect().map(r => r.getString(0)).toSet
    assert(m === Set("cat", "ran")) // 'the' (df 4) and df-1 tokens gone
  }

  test("df equals postings length for every token") {
    InvertedIndex.build(docs, "doc_id", "text").collect().foreach { r =>
      assert(r.getLong(1) === r.getString(2).split(",").length.toLong)
    }
  }
}
