package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => T}

/** Corpus-level term weighting and ranking — TF-IDF and Okapi BM25
  * (Robertson & Spärck Jones; the exact formulas Lucene documents) over
  * the same whitespace tokenization every other text operator uses.
  *
  * Scale shape: one tokenize pass feeds a (doc, term) count whose
  * shuffle is map-side combined; document frequency is a re-aggregation
  * of that frame (terms, not documents, cross the second shuffle — the
  * vocabulary is orders of magnitude smaller than the corpus); corpus
  * constants (N, avgdl) ride along as 1-row broadcast cross joins, never
  * a driver round-trip. BM25 prunes to the query's terms BEFORE the
  * first shuffle, so scoring cost is O(docs containing a query term),
  * not O(corpus tokens).
  */
object TextRank {

  private def terms(textCol: Column): Column = T.tokens(lower(textCol))

  /** Adjacent-pair explode shared by the bigram LMs: (doc, a, b) from
    * a (doc, tk) token-array frame via arrays_zip over two slices —
    * plain codegen'd expressions end to end, measurably faster than
    * the transform-HOF derivation it replaced (interpreted lambdas
    * don't codegen; texttail drill: 0.22 s vs 0.36 s at sf0.1). */
  private def bigramPairs(toks: DataFrame): DataFrame =
    toks.select(col("doc"),
      explode(arrays_zip(
        slice(col("tk"), lit(1), size(col("tk")) - 1).as("a"),
        slice(col("tk"), lit(2), size(col("tk")) - 1).as("b"))).as("p"))
      .select(col("doc"), col("p.a").as("a"), col("p.b").as("b"))

  /** Per-document top-k terms by smoothed TF-IDF
    * (`tf * (ln((N+1)/(df+1)) + 1)`). Ties break on term ascending.
    * Returns (doc, term, tf, df, tfidf, rn).
    *
    * `broadcastVocab` hints the df-side join (right for any natural-
    * language vocabulary; disable for degenerate corpora whose term
    * count rivals the corpus). */
  def tfIdfTopK(docs: DataFrame, idCol: String, textCol: String, k: Int,
      broadcastVocab: Boolean = true): DataFrame = {
    require(k > 0, "k must be positive")
    val tf = docs
      .select(col(idCol).as("doc"), explode(terms(col(textCol))).as("term"))
      .groupBy("doc", "term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val score =
      col("tf") * (log((col("n_docs") + lit(1.0)) / (col("df") + lit(1.0)))
        + lit(1.0))
    tf.join(if (broadcastVocab) broadcast(dfreq) else dfreq, "term")
      .crossJoin(broadcast(nDocs))
      .withColumn("tfidf", score)
      .withColumn("rn", row_number().over(
        Window.partitionBy("doc").orderBy(col("tfidf").desc, col("term"))))
      .filter(col("rn") <= k)
      .select(col("doc"), col("term"), col("tf"), col("df"),
        col("tfidf"), col("rn"))
  }

  /** Unigram surprisal — the CCNet-style perplexity proxy for quality
    * filtering: each document's mean negative log-likelihood under the
    * corpus's own unigram distribution, `-mean(ln p(token))`. Documents
    * full of corpus-typical tokens score low; rare-token soup scores
    * high — the cheap stand-in for an LM perplexity filter that needs
    * no model, just one extra aggregation over the same token pass.
    * Returns (doc, n_tokens, surprisal); empty docs are absent.
    *
    * Scale: the unigram table is vocabulary-sized — `broadcastVocab`
    * hints its join (right for natural-language vocabularies; disable
    * for web-scale corpora whose Heaps-law vocabulary would OOM a
    * forced broadcast — the tfIdfTopK flag convention); the token
    * count rides the same 1-row rider as every corpus constant. */
  def unigramSurprisal(docs: DataFrame, idCol: String,
      textCol: String, broadcastVocab: Boolean = true): DataFrame = {
    def hint(df: DataFrame) = if (broadcastVocab) broadcast(df) else df
    // persisted: the token frame feeds the vocab aggregate, the corpus
    // total, AND the broadcast-joined scoring probe — the broadcast
    // join gives ReuseExchange nothing to dedup, so an unpersisted
    // frame re-tokenizes the corpus three times (the bigram/KN
    // siblings cache for the same reason)
    val toks = docs.select(col(idCol).as("doc"),
      explode(terms(col(textCol))).as("term")).persist()
    val freq = toks.groupBy("term").agg(count(lit(1)).as("cnt"))
    val total = toks.agg(count(lit(1)).as("total"))
    val out = toks.join(hint(freq), "term")
      .crossJoin(broadcast(total))
      // DECIMAL sum for shuffle-order-independent totals (see bm25TopK)
      .groupBy("doc")
      .agg(count(lit(1)).as("n_tokens"),
        ((-sum(log(col("cnt") / col("total")).cast("decimal(28,14)"))
          .cast("double")) / count(lit(1)))
          .as("surprisal"))
      .localCheckpoint() // doc-sized; frees the cache below
    toks.unpersist()
    out
  }

  /** Bigram surprisal — the next step up from [[unigramSurprisal]]:
    * each document's mean `-ln P(w_i | w_{i-1})` under the corpus's own
    * bigram model, `P(b | a) = C(a,b) / C(a,·)`. Scoring the corpus
    * that built the counts means every observed bigram has C ≥ 1 — no
    * smoothing needed, and both engines compute identical rational
    * probabilities before the log. Fluent common phrasing scores low;
    * incoherent token soup scores high even when its unigrams are
    * corpus-typical — exactly the gap a unigram filter misses.
    * Documents with fewer than two tokens are absent.
    *
    * Scale: the bigram table is observed-bigram-sized (broadcast here;
    * for web-scale vocabularies switch to the plain shuffled join —
    * one equi-join keyed (a, b), same plan class as tf-idf's df join);
    * context totals derive from the bigram table, not a second corpus
    * pass. */
  def bigramSurprisal(docs: DataFrame, idCol: String,
      textCol: String, broadcastVocab: Boolean = true): DataFrame = {
    // broadcastVocab: the cnt/ctx frames are bigram-TYPE-sized —
    // Heaps-law unbounded on a web corpus; the flag is the caller's
    // informed choice (tfIdfTopK convention), default right for
    // natural-language gates
    def hint(df: DataFrame) = if (broadcastVocab) broadcast(df) else df
    val toks = docs.select(col(idCol).as("doc"), terms(col(textCol)).as("tk"))
      .filter(size(col("tk")) >= 2)
    // persist: the count aggregate AND the scoring join both read the
    // bigram frame; without the cache the tokenize+derive runs twice
    val bi = bigramPairs(toks).persist()
    val cnt = bi.groupBy("a", "b").agg(count(lit(1)).as("cnt"))
    val ctx = cnt.groupBy("a").agg(sum(col("cnt")).as("ctx"))
    val out = bi.join(hint(cnt), Seq("a", "b"))
      .join(hint(ctx), Seq("a"))
      // DECIMAL sum: shuffle-order-independent, like unigramSurprisal
      .groupBy("doc")
      .agg(count(lit(1)).as("n_bigrams"),
        ((-sum(log(col("cnt") / col("ctx")).cast("decimal(28,14)"))
          .cast("double")) / count(lit(1)))
          .as("bigram_surprisal"))
      .localCheckpoint() // doc-sized; frees the bigram cache below
    bi.unpersist()
    out
  }

  /** Interpolated Kneser-Ney bigram score per document (Kneser & Ney
    * 1995; Chen & Goodman 1999 formulation), absolute discount
    * D = 0.75:
    *
    *   P(b|a) = max(c(a,b) − D, 0)/c(a·)
    *          + (D · N1+(a·)/c(a·)) · N1+(·b)/T
    *
    * where c(a·) = Σ_b c(a,b), N1+(a·) = #distinct successors of a,
    * N1+(·b) = #distinct predecessors of b (the CONTINUATION count —
    * the thing that makes KN rank "Francisco" low despite high raw
    * frequency), T = #distinct bigram types. The step past t16's
    * raw-MLE surprisal: unseen-context mass is redistributed by
    * versatility, the production smoothing for n-gram quality scoring.
    *
    * Every model statistic is an integer count from a relational
    * aggregate over ONE persisted bigram frame; the double score chain
    * has a fixed shape mirrored textually in the DuckDB oracle, and
    * per-doc sums are decimal-quantized (t12 recipe). Output:
    * (doc, n_bigrams, kn_score) with kn_score = −mean ln P. */
  def kneserNeyBigram(docs: DataFrame, idCol: String,
      textCol: String, broadcastVocab: Boolean = true): DataFrame = {
    // cnt/ctx/cont are bigram-type/vocab-sized: same flag convention
    // as bigramSurprisal (types stays broadcast — it is one row)
    def hint(df: DataFrame) = if (broadcastVocab) broadcast(df) else df
    val toks = docs.select(col(idCol).as("doc"), terms(col(textCol)).as("tk"))
      .filter(size(col("tk")) >= 2)
    val bi = bigramPairs(toks).persist()
    // type-level counts feed four aggregates + the scoring join
    val cnt = bi.groupBy("a", "b").agg(count(lit(1)).as("cnt")).persist()
    val ctx = cnt.groupBy("a")
      .agg(sum(col("cnt")).as("ctot"), count(lit(1)).as("fan"))
    val cont = cnt.groupBy("b").agg(count(lit(1)).as("cont"))
    val types = cnt.agg(count(lit(1)).as("tt"))
    // fixed-shape double chain — textually mirrored in the oracle SQL
    val p = expr(
      "greatest(CAST(cnt AS DOUBLE) - CAST(0.75 AS DOUBLE), " +
        "CAST(0 AS DOUBLE)) / ctot + " +
        "(CAST(0.75 AS DOUBLE) * CAST(fan AS DOUBLE) / ctot) * " +
        "(CAST(cont AS DOUBLE) / tt)")
    val out = bi.join(hint(cnt), Seq("a", "b"))
      .join(hint(ctx), Seq("a"))
      .join(hint(cont), Seq("b"))
      .crossJoin(broadcast(types))
      .groupBy("doc")
      .agg(count(lit(1)).as("n_bigrams"),
        ((-sum(log(p).cast("decimal(28,14)")).cast("double")) /
          count(lit(1))).as("kn_score"))
      .localCheckpoint() // doc-sized; frees the caches below
    bi.unpersist(); cnt.unpersist()
    out
  }

  /** Okapi BM25 top-k documents for a bag of query terms:
    * `sum_q idf_q * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))` with
    * `idf_q = ln(1 + (N - df + 0.5)/(df + 0.5))`. Documents matching no
    * query term are absent (score 0). Ties break on doc ascending.
    * Returns (doc, dl, score). */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    require(k > 0, "k must be positive")
    // document tokens are lowercased by terms(); match query terms in
    // the same case-space — an uppercase query term would otherwise
    // silently contribute 0 to every score
    val qTerms = queryTerms.map(_.toLowerCase)
    val toks = docs.select(col(idCol).as("doc"),
      terms(col(textCol)).as("tk"))
    // N and avgdl come from the WHOLE corpus (before the query-term
    // prune) — a 1-row aggregate broadcast into the scoring join
    val stats = toks.agg(count(lit(1)).as("n_docs"),
      avg(size(col("tk"))).as("avgdl"))
    val tf = toks
      .select(col("doc"), size(col("tk")).as("dl"),
        explode(col("tk")).as("term"))
      .filter(col("term").isInCollection(qTerms))
      .groupBy("doc", "dl", "term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val idf = log(lit(1.0) +
      (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val termScore = idf * (col("tf") * lit(k1 + 1.0)) /
      (col("tf") + lit(k1) * (lit(1.0 - b) +
        lit(b) * col("dl") / col("avgdl")))
    tf.join(broadcast(dfreq), "term")
      .crossJoin(broadcast(stats))
      // DECIMAL sum: the per-doc total must not depend on which order
      // the term rows arrive from the shuffle (a double sum does — the
      // same determinism rule the k-means means follow)
      .groupBy("doc", "dl")
      .agg(sum(termScore.cast("decimal(28,14)")).cast("double").as("score"))
      .orderBy(col("score").desc, col("doc"))
      .limit(k)
  }
}
