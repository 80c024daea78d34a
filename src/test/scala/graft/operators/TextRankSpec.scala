package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TextRankSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "cat dog cat"),
    (2L, "dog fish"),
    (3L, "cat fish bird")).toDF("doc_id", "text")

  test("tfIdfTopK: hand-computed scores, term-asc tie break") {
    val got = TextRank.tfIdfTopK(corpus, "doc_id", "text", k = 2)
      .select("doc", "term", "tfidf")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      .sortBy(t => (t._1, t._2))
    // N=3; df: cat 2, dog 2, fish 2, bird 1
    val idf2 = math.log(4.0 / 3.0) + 1.0
    val idf1 = math.log(2.0) + 1.0
    assert(got.map(t => (t._1, t._2)).toSeq ===
      Seq((1L, "cat"), (1L, "dog"), (2L, "dog"), (2L, "fish"),
        (3L, "bird"), (3L, "cat"))) // doc3: cat beats fish on the tie
    val byKey = got.map(t => (t._1, t._2) -> t._3).toMap
    assert(math.abs(byKey((1L, "cat")) - 2 * idf2) < 1e-12)
    assert(math.abs(byKey((3L, "bird")) - idf1) < 1e-12)
  }

  test("bm25TopK: rare term dominates; non-matching docs absent") {
    val got = TextRank.bm25TopK(corpus, "doc_id", "text",
      queryTerms = Seq("bird", "dog"), k = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    // doc3 holds the rare term (df=1) -> ranks first; doc1/doc2 match
    // only 'dog' (df=2); all three docs match something
    assert(got.map(_._1).toSeq === Seq(3L, 2L, 1L))
    // hand-check doc3: dl=3, avgdl=8/3, tf(bird)=1
    val idfBird = math.log(1.0 + (3 - 1 + 0.5) / 1.5)
    val denom = 1.0 + 1.2 * (0.25 + 0.75 * 3 / (8.0 / 3))
    assert(math.abs(got.head._3 - idfBird * 2.2 / denom) < 1e-12)
    // doc with no query term is absent
    val none = TextRank.bm25TopK(corpus, "doc_id", "text",
      queryTerms = Seq("zebra"), k = 3)
    assert(none.count() === 0)
  }

  test("plan: df side and corpus stats broadcast, never shuffled-joined") {
    def explained(df: org.apache.spark.sql.DataFrame): String =
      df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("extended"))
    val tfidf = explained(TextRank.tfIdfTopK(corpus, "doc_id", "text", 2))
    assert("BroadcastExchange".r.findAllIn(tfidf).length >= 2, tfidf)
    assert(!tfidf.contains("SortMergeJoin"), tfidf)
    val bm = explained(
      TextRank.bm25TopK(corpus, "doc_id", "text", Seq("cat"), 2))
    assert("BroadcastExchange".r.findAllIn(bm).length >= 2, bm)
    assert(!bm.contains("SortMergeJoin"), bm)
  }

  test("bm25TopK: query-term prune sits below the first aggregation") {
    val plan = TextRank.bm25TopK(corpus, "doc_id", "text", Seq("cat"), 2)
      .queryExecution.optimizedPlan
    // the IN filter must appear under (before) every Aggregate node so
    // non-query terms never enter a shuffle
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter}
    val aggsAboveFilter = plan.collect {
      case a: Aggregate if a.collectLeaves().nonEmpty &&
        a.collect { case f: Filter if f.condition.sql.contains("cat") => f }
          .nonEmpty => a
    }
    assert(aggsAboveFilter.nonEmpty, plan.treeString)
  }
  test("unigramSurprisal: hand-computed; rare-token doc scores higher") {
    val got = TextRank.unigramSurprisal(corpus, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    // corpus tokens (8 total): cat x3, dog x2, fish x2, bird x1
    val p = Map("cat" -> 3.0 / 8, "dog" -> 2.0 / 8, "fish" -> 2.0 / 8,
      "bird" -> 1.0 / 8)
    def want(ts: String*) =
      -ts.map(t => math.log(p(t))).sum / ts.size
    assert(got(1L)._1 === 3L)
    assert(math.abs(got(1L)._2 - want("cat", "dog", "cat")) < 1e-12)
    assert(math.abs(got(3L)._2 - want("cat", "fish", "bird")) < 1e-12)
    // doc 3 holds the rare token -> strictly more surprising than doc 1
    assert(got(3L)._2 > got(1L)._2)
  }

  test("broadcastVocab=false changes the plan, never the values") {
    // the shuffled-equi-join fallback (web-scale vocabularies) must be
    // value-identical to the broadcast default on every family member
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("doc").collect().map(_.toSeq).toSeq
    assert(rows(TextRank.unigramSurprisal(corpus, "doc_id", "text",
      broadcastVocab = false)) ===
      rows(TextRank.unigramSurprisal(corpus, "doc_id", "text")))
    assert(rows(TextRank.bigramSurprisal(corpus, "doc_id", "text",
      broadcastVocab = false)) ===
      rows(TextRank.bigramSurprisal(corpus, "doc_id", "text")))
    assert(rows(TextRank.kneserNeyBigram(corpus, "doc_id", "text",
      broadcastVocab = false)) ===
      rows(TextRank.kneserNeyBigram(corpus, "doc_id", "text")))
  }

  test("bigramSurprisal: hand-computed conditional probabilities; " +
      "sub-2-token docs absent") {
    val docs = Seq(
      (1L, "cat dog cat"),   // bigrams: (cat,dog), (dog,cat)
      (2L, "cat dog fish"),  // bigrams: (cat,dog), (dog,fish)
      (3L, "cat")            // no bigrams -> absent
    ).toDF("doc_id", "text")
    val got = TextRank.bigramSurprisal(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    // counts: (cat,dog)=2, (dog,cat)=1, (dog,fish)=1; ctx: cat=2, dog=2
    val p = Map(("cat", "dog") -> 2.0 / 2, ("dog", "cat") -> 1.0 / 2,
      ("dog", "fish") -> 1.0 / 2)
    def want(bs: (String, String)*) =
      -bs.map(b => math.log(p(b))).sum / bs.size
    assert(!got.contains(3L))
    assert(got(1L)._1 === 2L)
    assert(math.abs(got(1L)._2 - want(("cat", "dog"), ("dog", "cat"))) < 1e-12)
    assert(math.abs(got(2L)._2 - want(("cat", "dog"), ("dog", "fish"))) < 1e-12)
    // (cat,dog) is certain given cat; doc with two half-likely bigrams
    // is NOT more surprising than doc 1 (both share one 1/2 bigram)
    assert(got(1L)._2 === got(2L)._2)
  }
}
