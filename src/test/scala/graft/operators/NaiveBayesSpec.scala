package graft.operators

import graft.SparkSpec

class NaiveBayesSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "the cat sat on the mat", "en"),
    (2L, "the dog ate the bone", "en"),
    (3L, "a bird in the hand", "en"),
    (4L, "el gato y el perro", "es"),
    (5L, "la casa de la playa", "es"),
    (6L, "el perro come en la casa", "es")).toDF("doc_id", "text", "lang")

  test("train counts: class stats and smoothed vocabulary inputs") {
    val m = NaiveBayes.train(corpus, "doc_id", "text", "lang")
    val cs = m.classStats.collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(cs("en") === (16L, 3L)) // 16 en tokens, 3 en docs
    assert(cs("es") === (16L, 3L))
    assert(m.totalDocs === 6L)
    val k = m.wordCounts.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(k(("the", "en")) === 5L)
    assert(k(("el", "es")) === 3L)
    assert(!k.contains(("el", "en")))
  }

  test("predict separates the two languages; unseen-word doc falls back " +
    "to prior + denominator") {
    val m = NaiveBayes.train(corpus, "doc_id", "text", "lang")
    val test = Seq(
      (10L, "the cat and the dog"),
      (11L, "el perro en la playa"),
      // all-unseen tokens: score = prior - n_d*log(tokens_c+V); both
      // classes have 16 tokens and equal priors -> exact tie -> 'en'
      (12L, "zzz qqq xxx")).toDF("doc_id", "text")
    val p = NaiveBayes.predict(m, test, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(p(10L) === "en")
    assert(p(11L) === "es")
    assert(p(12L) === "en")
  }

  test("confusion: resubstitution on separable corpus is diagonal") {
    val c = NaiveBayes.confusion(corpus, "doc_id", "text", "lang")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(c === Map(("en", "en") -> 3L, ("es", "es") -> 3L))
  }

  test("argmax tie-break goes to the lexicographically smallest label") {
    // perfectly symmetric corpus: every score ties -> 'aa' beats 'bb'
    val sym = Seq(
      (1L, "x y", "aa"), (2L, "x y", "bb")).toDF("doc_id", "text", "lang")
    val m = NaiveBayes.train(sym, "doc_id", "text", "lang")
    val p = NaiveBayes.predict(m, sym.select("doc_id", "text"),
      "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(p === Map(1L -> "aa", 2L -> "aa"))
  }
}
