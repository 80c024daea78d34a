package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PerplexityFilterSpec extends SparkSpec {
  import spark.implicits._

  test("hand-computed add-one bigram CE; rank-cut tiers in CE order") {
    // reference = doc 0 "a b a b": cnt(a,b)=2, cnt(b,a)=1; ctx(a)=2,
    // ctx(b)=1; V=2. Hand CE:
    //   doc 1 "a b":   -ln(3/4)                       = 0.2877
    //   doc 0 itself:  -(2 ln(3/4) + ln(2/3)) / 3     = 0.3269
    //   doc 2 "z z":   -ln(1/(0+2))                   = 0.6931 (all unseen)
    val docs = Seq((0L, "a b a b"), (1L, "a b"), (2L, "z z"))
      .toDF("doc_id", "text")
    val out = PerplexityFilter.buckets(docs, "doc_id", "text",
      col("doc_id") === 0, nBuckets = 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3)))
    assert(out.map(t => (t._1, t._2)).toSeq ===
      Seq((0L, 1L), (1L, 1L), (2L, 1L)))
    assert(out(0)._3 === 0.2877) // head: most reference-like
    assert(out(1)._3 === 0.3269)
    assert(out(2)._3 === 0.6931) // tail: nothing the model has seen
  }

  test("sub-2-token docs are excluded; equal-count cut over the rest") {
    val docs = Seq((0L, "a b a b"), (1L, "a b"), (2L, "z z"),
      (3L, "single"), (4L, "")).toDF("doc_id", "text")
    val out = PerplexityFilter.buckets(docs, "doc_id", "text",
      col("doc_id") === 0, nBuckets = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // docs 3 and 4 carry no bigram evidence — same 3 tiers as above
    assert(out.toSeq === Seq((0L, 1L), (1L, 1L), (2L, 1L)))
  }

  test("a vocab past the broadcast gate still executes (unhinted ctx " +
    "join), with identical tiers") {
    val docs = Seq((0L, "a b a b"), (1L, "a b"), (2L, "z z"))
      .toDF("doc_id", "text")
    def run(cap: Long) = PerplexityFilter.buckets(docs, "doc_id",
      "text", col("doc_id") === 0, nBuckets = 3,
      ctxBroadcastMaxVocab = cap)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3))).toSeq
    // cap=0 forces v(=2) past the gate — the ctx join runs unhinted,
    // exactly what a 10⁹-token web-scale reference would get
    assert(run(0L) === run(PerplexityFilter.CtxBroadcastMaxVocab))
  }

  test("an empty (or bigram-free) reference slice fails loudly") {
    val docs = Seq((1L, "a b"), (2L, "z z")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      PerplexityFilter.buckets(docs, "doc_id", "text",
        col("doc_id") === 99, nBuckets = 3)
    }
  }
}
