package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.{TextFunctions => T}

/** Text-analysis queries over the `documents` table, each with an exactly
  * mirrored DuckDB oracle.
  *
  * SQL-mirroring gotchas handled here:
  *  - DuckDB `regexp_replace` needs the 'g' flag (Spark replaces all);
  *  - tokens = split on \s+ with empties filtered, identical both sides;
  *  - double→rendered values rounded to 4 digits where arithmetic chains
  *    could differ in the last ulp.
  */
object TextQueries {

  private val duckTokens =
    "list_filter(string_split_regex(trim(text), '\\s+'), t -> t <> '')"

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")

  private def t01(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(col("doc_id"),
      T.tokenCount(col("text")).as("n_tokens"),
      T.subwordCount(col("text")).as("n_subwords"))
      .orderBy("doc_id").limit(200)

  private def t02(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(col("doc_id"),
      round(T.qualityScore(col("text")), 4).as("quality"))
      .orderBy("doc_id").limit(200)

  private def t03(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).groupBy(T.langId(col("text")).as("lang_pred"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy("lang_pred")

  // Deterministic per-language sentences (real closed-class words) used
  // to build t30's SEPARABLE evaluation corpus: the synthetic documents
  // share one English-ish vocabulary across all lang labels, so raw
  // labels are unlearnable from content (any classifier caps at the
  // 43.6% majority class). Both engines plant the labeled language's
  // snippet in front of 12 original tokens (the noise), so the gate
  // measures whether the classifier recovers the language from genuinely
  // language-bearing text under adversarial same-script noise.
  private[queries] val langSnippets: Seq[(String, String)] = Seq(
    "en" -> "the cat and the dog that is in this house with the king",
    "es" -> "el perro y el gato no están en la casa de los niños porque se fueron",
    "de" -> "der hund und die katze sind nicht in dem haus mit einem großen garten",
    "fr" -> "le chien et les chats ne sont pas dans la maison avec une grande porte",
    "zh" -> "猫和狗在房子里")

  // langid EVALUATED on the planted separable corpus — the confusion
  // matrix + accuracy every heuristic classifier owes its deployer
  // (t03 reports raw-corpus predictions; this reports how often the
  // classifier is right on text that actually carries its label's
  // language, and WHERE it goes wrong). One (true, pred) shuffle,
  // cells-sized after; accuracy in div-ppm integers rides on every row
  // the planted-corpus confusion cells t30 (accuracy) and t31
  // (per-class P/R/F1) both read — cells-sized, checkpointed once
  // per call
  private def langEvalCells(s: SparkSession, dir: String): DataFrame = {
    val snippet = langSnippets.tail.foldLeft(
      when(col("lang") === langSnippets.head._1, langSnippets.head._2)) {
      case (acc, (k, v)) => acc.when(col("lang") === k, v)
    }
    docs(s, dir)
      .select(col("lang").as("lang_true"),
        concat(snippet, lit(" "),
          array_join(slice(T.tokens(col("text")), 1, 12), " ")).as("text"))
      .select(col("lang_true"), T.langId(col("text")).as("lang_pred"))
      .groupBy("lang_true", "lang_pred")
      .agg(count(lit(1)).as("cnt"))
      .localCheckpoint() // cells-sized; read by the rider(s) too
  }

  private def t30(s: SparkSession, dir: String): DataFrame = {
    val cells = langEvalCells(s, dir)
    val acc = cells.agg(sum(col("cnt")).cast("long").as("n_docs"),
        sum(when(col("lang_true") === col("lang_pred"), col("cnt"))
          .otherwise(0L)).cast("long").as("n_correct"))
      .select(col("n_docs"), col("n_correct"),
        expr("CASE WHEN n_docs > 0 THEN (1000000 * n_correct) " +
          "div n_docs END").as("accuracy_ppm"))
    cells.crossJoin(broadcast(acc))
      .orderBy("lang_true", "lang_pred")
  }

  // per-class precision/recall/F1 + macro-F1 from the same planted
  // confusion cells (t30 reads accuracy — the one number that HIDES
  // per-class collapse; this is the readout that shows it): exact ppm
  // floor-divisions, F1's harmonic mean in long arithmetic
  // (2·p·r ≤ 2·10¹², never near overflow), classes with zero
  // predictions score F1 = 0 by the tp = 0 branch (the standard
  // macro-averaging convention, documented rather than NULL-dropped)
  private def t31(s: SparkSession, dir: String): DataFrame = {
    val cells = langEvalCells(s, dir)
    val sup = cells.groupBy(col("lang_true").as("lang")).agg(
      sum(col("cnt")).cast("long").as("support"),
      sum(when(col("lang_pred") === col("lang_true"), col("cnt"))
        .otherwise(0L)).cast("long").as("tp"))
    val prd = cells.groupBy(col("lang_pred").as("lang"))
      .agg(sum(col("cnt")).cast("long").as("predicted"))
    val met = sup.join(prd, Seq("lang"), "left")
      .withColumn("predicted", coalesce(col("predicted"), lit(0L)))
      .withColumn("precision_ppm", expr(
        "CASE WHEN predicted > 0 THEN (1000000 * tp) div predicted END"))
      .withColumn("recall_ppm", expr(
        "CASE WHEN support > 0 THEN (1000000 * tp) div support END"))
      .withColumn("f1_ppm", expr(
        "CASE WHEN tp = 0 THEN 0L ELSE (2 * precision_ppm * " +
          "recall_ppm) div (precision_ppm + recall_ppm) END"))
      .localCheckpoint() // classes-sized; the macro rider reads it
    val macroF1 = met.agg(expr(
      "CAST(sum(f1_ppm) div count(*) AS BIGINT)").as("macro_f1_ppm"))
    met.crossJoin(broadcast(macroF1)).orderBy("lang")
  }

  private def t04(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(col("doc_id"), T.fingerprint(col("text")).as("fp"))
      .orderBy("doc_id").limit(100)

  // custom Generator (UDTF): positional tokens, one generated row each
  private def t05(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.classic.{GraftColumnBridge => bridge}
    docs(s, dir).filter(col("doc_id") <= 3)
      .select(col("doc_id"),
        bridge.column(graft.plans.Tokenize(bridge.expression(col("text"))))
          .as(Seq("pos", "token")))
      .orderBy("doc_id", "pos")
  }

  // typed Aggregator gate: per-language MinHash sketch union (element-
  // wise min) through the untyped udaf() path — partial+final agg, the
  // shuffle carries 64 longs per language, never documents. Two-stage
  // oracle: DuckDB recomputes the element-wise group min from the
  // per-doc signature fixture.
  private def t06(s: SparkSession, dir: String): DataFrame = {
    val mh = udaf(new graft.functions.MinHashAgg(64),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]())
    docs(s, dir)
      .select(col("lang"),
        T.minHashSignature(lower(col("text")), 3, 64).as("sig"))
      .groupBy("lang").agg(mh(col("sig")).as("gsig"))
      .select(col("lang"), posexplode(col("gsig")))
      .toDF("lang", "pos", "v")
      .select(col("lang"), col("pos").cast("long").as("pos"), col("v"))
      .orderBy("lang", "pos")
  }

  // corpus vocabulary: token frequencies with a min-count floor, top-50
  // — the first pass of any tokenizer/vocab build. Pure
  // explode+groupBy+top-k: map-side partial agg, shuffle carries
  // (token, count), TakeOrderedAndProject caps the result.
  private def t07(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(explode(T.tokens(lower(col("text")))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= 5)
      .orderBy(col("cnt").desc, col("token"))
      .limit(50)

  // duplicate-bigram repetition ratio (Gopher-style boilerplate signal)
  private def t08(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(col("doc_id"),
      round(T.repetitionRatio(col("text"), 2), 4).as("rep"))
      .orderBy("doc_id").limit(200)

  // PII redaction: the synthetic docs carry no PII, so the gate PLANTS
  // a deterministic email/IP/phone per doc (same construction in both
  // engines) and checks the scrub — the redaction logic is what's
  // gated, over real document text as the surrounding corpus.
  private def t09(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(col("doc_id"),
        T.redactPii(concat(col("text"),
          lit(" contact u"), col("doc_id"), lit("@ex-co.io from 10.0."),
          pmod(col("doc_id"), lit(256)), lit(".7 tel 555-123-4567 end")))
          .as("redacted"))
      .orderBy("doc_id").limit(100)

  // corpus-level TF-IDF: top-3 terms per doc; tf/df ride along as
  // integer anchors so the hash pins the counts, not just the rounded
  // double
  private def t10(s: SparkSession, dir: String): DataFrame =
    graft.operators.TextRank.tfIdfTopK(docs(s, dir), "doc_id", "text", 3)
      .select(col("doc").as("doc_id"), col("term"), col("tf"), col("df"),
        round(col("tfidf"), 4).as("tfidf"))
      .orderBy("doc_id", "term")

  // Okapi BM25 over a mixed rare/common query; dl rides as an anchor
  private def t11(s: SparkSession, dir: String): DataFrame =
    graft.operators.TextRank.bm25TopK(docs(s, dir), "doc_id", "text",
      queryTerms = Seq("dup", "spark", "join"), k = 20)
      .select(col("doc").as("doc_id"), col("dl"),
        round(col("score"), 4).as("score"))
      .orderBy("doc_id") // row order independent of float comparisons

  // unigram surprisal (perplexity-proxy quality signal); n_tokens
  // rides as an integer anchor
  private def t12(s: SparkSession, dir: String): DataFrame =
    graft.operators.TextRank.unigramSurprisal(docs(s, dir), "doc_id", "text")
      .select(col("doc").as("doc_id"), col("n_tokens"),
        round(col("surprisal"), 4).as("surprisal"))
      .orderBy("doc_id").limit(200)

  // RAG chunking (50-word windows, stride 40 → 10 words of overlap):
  // per-doc chunk count, word mass, and an order-independent md5
  // fingerprint of every chunk text pin the exact window contents —
  // boundaries, overlap, and the short final chunk
  private def t13(s: SparkSession, dir: String): DataFrame =
    graft.operators.Chunker.chunk(docs(s, dir), "doc_id", "text",
      window = 50, stride = 40)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_chunks"),
        sum(col("n_words")).as("chunk_words"),
        sum(conv(substring(md5(col("chunk_text")), 1, 8), 16, 10)
          .cast("long")).as("fp"))
      .orderBy("doc_id")

  // inverted index (token → sorted postings): df band [5, 400] drops
  // the hottest token (df 402 at sf0.01) BEFORE any postings state is
  // collected — the head-token guard is what the gate checks engages
  private def t14(s: SparkSession, dir: String): DataFrame =
    graft.operators.InvertedIndex.build(docs(s, dir), "doc_id", "text",
      minDf = 5L, maxDf = 400L)
      .orderBy("token")

  // BPE merge training (Sennrich 2016) on the corpus word table:
  // iterative argmax-merge is not SQL-expressible, so this gate is
  // rows-only per the driver contract; exact semantics are pinned by
  // BpeTrainSpec's distributed==in-memory-reference property instead.
  // The corpus-scale work is wordFreqs' one count shuffle; the 8 merge
  // rounds run on the vocab-sized frame (31 words at any sf here).
  private def t15(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val merges = graft.operators.BpeTrain.train(s,
      graft.operators.BpeTrain.wordFreqs(docs(s, dir), "text"), 8)
    merges.zipWithIndex
      .map { case ((a, b), i) => (i, a, b) }
      .toDF("merge_idx", "a", "b")
      .orderBy("merge_idx")
  }

  // bigram surprisal: the conditional-probability step past t12 —
  // catches incoherent token soup whose unigrams look corpus-typical
  private def t16(s: SparkSession, dir: String): DataFrame =
    graft.operators.TextRank.bigramSurprisal(docs(s, dir), "doc_id", "text")
      .select(col("doc").as("doc_id"), col("n_bigrams"),
        round(col("bigram_surprisal"), 4).as("bigram_surprisal"))
      .orderBy("doc_id").limit(200)

  // corpus-level BPE ENCODING (the application half of t15's training):
  // each doc's subword-piece stream, fingerprinted. Two-stage oracle:
  // the vocab-sized word->pieces table goes to aux (its own correctness
  // is pinned by BpeTrainSpec's distributed==reference property), and
  // DuckDB replays the corpus plumbing — tokenize, join, positional
  // reassembly, flatten — that the distributed path must get right.
  private def t17(s: SparkSession, dir: String): DataFrame = {
    val merges = graft.operators.BpeTrain.train(s,
      graft.operators.BpeTrain.wordFreqs(docs(s, dir), "text"), 8)
    graft.operators.BpeTrain.encodeCorpus(s, docs(s, dir), "doc_id",
      "text", merges)
      .select(col("doc").as("doc_id"),
        size(col("pieces")).cast("long").as("n_pieces"),
        md5(concat_ws(" ", col("pieces"))).as("pieces_fp"))
      .orderBy("doc_id")
  }

  // Naive Bayes language classifier trained on the corpus's own lang
  // labels, confusion-matrix gate. Training is pure counting, so the
  // ENTIRE train+score pipeline (priors, add-one likelihoods, per-doc
  // log-score argmax) replays in one DuckDB CTE — a full-model oracle,
  // not a fixture.
  private def t18(s: SparkSession, dir: String): DataFrame =
    graft.operators.NaiveBayes.confusion(docs(s, dir), "doc_id", "text",
      "lang")
      .select(col("truth"), col("pred"), col("n"))
      .orderBy("truth", "pred")

  // Gopher rules, exact integer thresholds — the corpus-curation keep/
  // drop decision with its full audit trail (per-rule flags + counters)
  private def t19(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(col("doc_id"), T.gopherStats(col("text")).as("g"))
      .select(col("doc_id"), col("g.*"))
      .orderBy("doc_id")

  // collocation lift: counts decide the rank (exact), the float column
  // is a fixed-shape division chain rounded to 4 digits
  private def t20(s: SparkSession, dir: String): DataFrame =
    graft.operators.Collocations.lift(docs(s, dir), "text", minCount = 10)
      .orderBy(col("c_xy").desc, col("x"), col("y"))
      .limit(30)

  // TextRank keyword extraction (Mihalcea & Tarau 2004): fixed-point
  // PageRank over the corpus word-adjacency graph — operator
  // composition: the SAME integer-exact PageRank as g01, so the
  // 5-iteration oracle unroll hash-matches on string node keys.
  // (Word keys are fine at this vocab; a web-scale run would
  // dictionary-encode them to longs exactly as g01 does.)
  private def t21(s: SparkSession, dir: String): DataFrame = {
    val bg = docs(s, dir)
      .select(explode(graft.operators.Collocations
        .bigramPairs(col("text"))).as("b"))
      .select(col("b.x").as("x"), col("b.y").as("y"))
      .filter(col("x") =!= col("y"))
      .distinct()
    val edges = bg.select(col("x").as("src"), col("y").as("dst"))
      .unionByName(bg.select(col("y").as("src"), col("x").as("dst")))
      .distinct()
    // aqeOff = false: measured on THIS word graph (r15 matched
    // (t20,t21) group, min-of-4, sf0.1) — AQE on 1.31 s vs off 1.84 s
    // isolated / 2.33 s beside the write-heavy p-gates; the string-
    // keyed word graph's node-sized shuffles want AQE coalescing,
    // unlike g01's pinned-layout order graph (the r14 drill's win)
    graft.operators.PageRank.ranks(edges, iters = 5, aqeOff = false)
      .select(col("node").as("word"), col("rank").as("pr"))
      .orderBy(col("pr").desc, col("word"))
      .limit(20)
  }

  // hashing-trick featurization: signed sparse vectors in a fixed
  // 64-dim space, md5-parity bucket/sign so DuckDB replays the exact
  // same matrix; every-101st doc keeps the gate result bounded
  private def t22(s: SparkSession, dir: String): DataFrame = {
    val toks = docs(s, dir).filter(col("doc_id") % 101 === 0)
      .select(col("doc_id"),
        explode(T.tokens(lower(col("text")))).as("token"))
    graft.operators.FeatureHash.sparseVectors(toks, "doc_id", "token",
        dim = 64)
      .orderBy("doc_id", "bucket")
  }

  // C4-style boilerplate strip (the REWRITE op d14's span report feeds):
  // 3-token tiles whose corpus df >= 3 are template, removed; docs come
  // back reassembled in order, one row per input doc. The clean_text
  // column itself is hash-gated — a reassembly-order or off-by-one slice
  // bug fails the gate, not just the counts.
  private def t23(s: SparkSession, dir: String): DataFrame =
    graft.operators.Boilerplate.strip(docs(s, dir), "doc_id", "text",
      tile = 3, dropDf = 3)
      .orderBy("doc_id")

  // per-doc character entropy (random-bytes / mojibake quality signal):
  // ONE codegen-projection pass per doc on the Spark side vs the oracle's
  // relational unnest — the gate cross-checks the two shapes. Counts are
  // integer anchors; the entropy double follows the t12 decimal-quantized
  // exact-sum recipe.
  private def t24(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      // coalesce BEFORE the null-intolerant native expression: a NULL
      // text must score as an empty doc — (0, 0, 0.0) — matching the
      // oracle's LEFT JOIN + coalesce (the Boilerplate NULL-guard
      // discipline; the fixture has no NULL texts today, but the gate
      // must not hash-fail the day one appears)
      .select(col("doc_id"),
        T.charEntropyStats(coalesce(col("text"), lit(""))).as("e"))
      .select(col("doc_id"), col("e.n_chars").as("n_chars"),
        col("e.n_distinct").as("n_distinct"),
        round(col("e.entropy"), 4).as("entropy"))
      .orderBy("doc_id")

  // Kneser-Ney smoothed bigram score — the production n-gram LM
  // quality signal (t16 is the raw-MLE baseline); continuation-count
  // smoothing is what separates "frequent because versatile" from
  // "frequent in one collocation"
  private def t25(s: SparkSession, dir: String): DataFrame =
    graft.operators.TextRank.kneserNeyBigram(docs(s, dir), "doc_id", "text")
      .select(col("doc").as("doc_id"), col("n_bigrams"),
        round(col("kn_score"), 4).as("kn_score"))
      .orderBy("doc_id").limit(200)

  // Flesch reading ease from heuristic counts (vowel-group syllables,
  // terminal-punctuation sentences) — integer anchors + one fixed-shape
  // double formula; docs with no real sentences floor at 1 sentence
  private def t26(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(col("doc_id"), T.readabilityStats(col("text")).as("r"))
      .filter(col("r.n_words") > 0)
      .select(col("doc_id"), col("r.n_words").as("n_words"),
        col("r.n_sentences").as("n_sentences"),
        col("r.n_syllables").as("n_syllables"),
        round(lit(206.835)
          - lit(1.015) * (col("r.n_words").cast("double") / col("r.n_sentences"))
          - lit(84.6) * (col("r.n_syllables").cast("double") / col("r.n_words")),
          4).as("flesch"))
      .orderBy("doc_id").limit(200)

  // Zipf-law fit — the corpus-health diagnostic (a natural-language
  // corpus's rank-frequency curve is ~power-law with slope ≈ −1;
  // boilerplate floods or template spam bend it): OLS of ln(freq) on
  // ln(rank) over the vocabulary. Ranks ride SequentialIds (range
  // exchange — no one-task window over the vocab), each ln term/product
  // is DECIMAL(28,14)-quantized before the exact sum (t12 recipe), the
  // closed-form OLS arithmetic on the five sums is identical IEEE in
  // both engines. One row: vocab size, token mass, slope, intercept.
  private def t27(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.SequentialIds
    val freq = docs(s, dir)
      .select(explode(T.tokens(lower(col("text")))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("cnt"))
    val ranked = SequentialIds
      .assign(freq, Seq(col("cnt").desc, col("term")), "_r0")
      .select(col("cnt"), (col("_r0") + 1).as("rank"))
      .select(col("cnt"),
        log(col("rank").cast("double")).as("x"),
        log(col("cnt").cast("double")).as("y"))
    val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(28,14)")
    ranked.agg(count(lit(1)).as("n"),
        sum(col("cnt")).as("toks"),
        sum(dec(col("x"))).cast("double").as("sx"),
        sum(dec(col("y"))).cast("double").as("sy"),
        sum(dec(col("x") * col("y"))).cast("double").as("sxy"),
        sum(dec(col("x") * col("x"))).cast("double").as("sxx"))
      .select(col("n").as("vocab_size"),
        col("toks").as("total_tokens"),
        round((col("n") * col("sxy") - col("sx") * col("sy")) /
          (col("n") * col("sxx") - col("sx") * col("sx")), 4)
          .as("zipf_slope"),
        round((col("sy") - ((col("n") * col("sxy") - col("sx") * col("sy")) /
          (col("n") * col("sxx") - col("sx") * col("sx"))) * col("sx")) /
          col("n"), 4).as("zipf_intercept"))
  }

  // RAKE keyword extraction (Rose et al. 2010): stopword-delimited
  // non-stop token runs scored by summed member degree/frequency —
  // the no-iteration keyword baseline next to t21's TextRank. Top 100
  // corpus-wide, ranked on the 4-digit rounding with text tie-break.
  private def t28(s: SparkSession, dir: String): DataFrame =
    graft.operators.Rake.keywords(docs(s, dir), "doc_id", "text",
      topK = 100)

  // CCNet-style perplexity bucketing (Wenzek et al. 2019): add-one
  // bigram LM trained on the doc_id % 10 == 0 slice (the curated-set
  // proxy), per-doc cross-entropy under it, three equal-count quality
  // tiers cut by a SequentialIds rank on (round(ce, 6), doc) — the
  // selection step between dedup and mixing; p14's DSIR is the
  // importance-weight cousin.
  private def t29(s: SparkSession, dir: String): DataFrame =
    graft.operators.PerplexityFilter.buckets(docs(s, dir), "doc_id",
      "text", pmod(col("doc_id"), lit(10)) === 0, nBuckets = 3)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t29_ppl_filter" -> (t29 _),
    "t22_feature_hash" -> (t22 _),
    "t23_boilerplate" -> (t23 _),
    "t24_char_entropy" -> (t24 _),
    "t25_kneser_ney" -> (t25 _),
    "t26_readability" -> (t26 _),
    "t27_zipf_fit" -> (t27 _),
    "t28_rake_keywords" -> (t28 _),
    "t01_token_counts" -> (t01 _),
    "t02_quality_score" -> (t02 _),
    "t03_langid" -> (t03 _),
    "t04_fingerprint" -> (t04 _),
    "t05_tokenize_udtf" -> (t05 _),
    "t06_minhash_union" -> (t06 _),
    "t07_vocab_topk" -> (t07 _),
    "t08_repetition" -> (t08 _),
    "t09_pii_redact" -> (t09 _),
    "t10_tfidf_topk" -> (t10 _),
    "t11_bm25" -> (t11 _),
    "t12_surprisal" -> (t12 _),
    "t13_chunking" -> (t13 _),
    "t14_inverted_index" -> (t14 _),
    "t15_bpe_merges" -> (t15 _),
    "t16_bigram_surprisal" -> (t16 _),
    "t17_bpe_encode" -> (t17 _),
    "t18_nb_confusion" -> (t18 _),
    "t19_gopher_rules" -> (t19 _),
    "t20_collocations" -> (t20 _),
    "t21_textrank" -> (t21 _),
    "t30_langid_eval" -> (t30 _),
    "t31_macro_f1" -> (t31 _),
  )

  /** Aux fixture for t06's two-stage oracle (see Verify). */
  val auxOutputs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t06_signatures" -> ((s, dir) =>
      docs(s, dir).select(col("lang"),
        T.minHashSignature(lower(col("text")), 3, 64).as("sig"))),
    "t17_pieces" -> ((s, dir) => {
      val merges = graft.operators.BpeTrain.train(s,
        graft.operators.BpeTrain.wordFreqs(docs(s, dir), "text"), 8)
      graft.operators.BpeTrain.encode(s,
        graft.operators.BpeTrain.wordFreqs(docs(s, dir), "text"), merges)
        .select("word", "pieces")
    }),
  )

  private val stop = Seq("the", "a", "an", "of", "and", "to", "in", "is",
    "that", "it", "for", "on", "with", "as", "was", "at", "by")
    .map(w => s"'$w'").mkString("[", ", ", "]")

  private def markerList(ws: Seq[String]) =
    ws.map(w => s"'$w'").mkString("[", ", ", "]")

  // DuckDB form of TextFunctions.langId's weighted score, generated from
  // the SAME LangProfile data so the two engines cannot drift.
  private def duckLangScore(p: T.LangProfile): String = {
    val words = "3 * len(list_filter(tk, t -> list_contains(" +
      s"${markerList(p.strong)}, t))) + len(list_filter(tk, " +
      s"t -> list_contains(${markerList(p.weak)}, t)))"
    if (p.accents.isEmpty) words
    else words + " + 5 * length(regexp_replace(lower(text), " +
      s"'[^${p.accents}]', '', 'g'))"
  }
  private val Seq(enScore, esScore, deScore, frScore) =
    T.langProfiles.map(duckLangScore)
  private val duckLangCase =
    "CASE WHEN cjk > 0 THEN 'zh' " +
      "WHEN en <= 0 AND es <= 0 AND de <= 0 AND fr <= 0 THEN 'unknown' " +
      "WHEN en >= es AND en >= de AND en >= fr THEN 'en' " +
      "WHEN es >= de AND es >= fr THEN 'es' " +
      "WHEN de >= fr THEN 'de' ELSE 'fr' END"
  private val duckSnippetCase = langSnippets.map { case (k, v) =>
    s"WHEN '$k' THEN '$v'"
  }.mkString("CASE lang ", " ", " END")

  // the planted-corpus confusion-cells CTE prefix t30 and t31 share
  // (one definition — the two oracles cannot drift from each other)
  private lazy val langCellsCteSql: String =
    "WITH planted AS (SELECT lang, " +
      s"($duckSnippetCase || ' ' || array_to_string(list_slice(" +
      "list_filter(string_split_regex(trim(text), '\\s+'), " +
      "t -> t <> ''), 1, 12), ' ')) AS text FROM documents), " +
      "toks AS (SELECT lang, text, " +
      "list_filter(string_split_regex(trim(lower(text)), '\\s+'), t -> t <> '') AS tk " +
      "FROM planted), " +
      s"hits AS (SELECT lang, " +
      "length(regexp_replace(text, '[^\\x{4e00}-\\x{9fff}]', '', 'g')) AS cjk, " +
      s"$enScore AS en, $esScore AS es, $deScore AS de, $frScore AS fr " +
      "FROM toks), " +
      s"p AS (SELECT lang AS lang_true, $duckLangCase AS lang_pred " +
      "FROM hits), " +
      "cells AS (SELECT lang_true, lang_pred, " +
      "CAST(count(*) AS BIGINT) AS cnt FROM p GROUP BY 1, 2)"

  val oracleSql: Map[String, String] = Map(
    // identical add-one bigram model from the % 10 reference slice
    // (counts, context totals, distinct-token V), identical
    // DECIMAL(28,14)-quantized ln terms, identical rank-based tercile
    // cut on (round(ce, 6), doc_id)
    "t29_ppl_filter" ->
      ("WITH tk0 AS (SELECT doc_id, list_filter(string_split_regex(" +
        "trim(lower(text)), '\\s+'), t -> t <> '') AS tk FROM documents), " +
        "t2 AS MATERIALIZED (SELECT doc_id, tk, doc_id % 10 = 0 AS ref " +
        "FROM tk0 WHERE len(tk) >= 2), " +
        "pairs AS MATERIALIZED (SELECT doc_id, ref, p[1] AS a, p[2] AS b " +
        "FROM (SELECT doc_id, ref, unnest(list_transform(" +
        "range(1, len(tk)), i -> [tk[i], tk[i + 1]])) AS p FROM t2)), " +
        "c AS (SELECT a, b, count(*) AS cnt FROM pairs WHERE ref " +
        "GROUP BY a, b), " +
        "cx AS (SELECT a, sum(cnt) AS ctx FROM c GROUP BY a), " +
        "v AS (SELECT count(DISTINCT w) AS v FROM " +
        "(SELECT unnest(tk) AS w FROM t2 WHERE ref)), " +
        "j AS (SELECT pairs.doc_id, coalesce(c.cnt, 0) + 1 AS num, " +
        "coalesce(cx.ctx, 0) + v.v AS den FROM pairs " +
        "LEFT JOIN c USING (a, b) LEFT JOIN cx USING (a) CROSS JOIN v), " +
        "ce AS (SELECT doc_id, -CAST(sum(CAST(ln(num / " +
        "CAST(den AS DOUBLE)) AS DECIMAL(28,14))) AS DOUBLE) / count(*) " +
        "AS ce FROM j GROUP BY doc_id), " +
        "rk AS (SELECT doc_id, ce, row_number() OVER (" +
        "ORDER BY round(ce, 6), doc_id) - 1 AS gid, " +
        "count(*) OVER () AS n FROM ce) " +
        "SELECT CAST(gid * 3 // n AS BIGINT) AS bucket, " +
        "count(*) AS n_docs, min(round(ce, 4)) AS ce_min, " +
        "max(round(ce, 4)) AS ce_max FROM rk " +
        "GROUP BY 1 ORDER BY bucket"),
    // identical islands chain key (pos - row_number), identical integer
    // word stats, degree/freq terms quantized DECIMAL(28,14) before the
    // exact per-phrase sum, rank on the rounding with text tie-break
    "t28_rake_keywords" ->
      ("WITH tk0 AS (SELECT doc_id, list_filter(string_split_regex(" +
        "trim(lower(text)), '\\s+'), t -> t <> '') AS ws FROM documents), " +
        "tk AS (SELECT doc_id, unnest(ws) AS w, " +
        "generate_subscripts(ws, 1) - 1 AS pos FROM tk0), " +
        "ns AS (SELECT doc_id, w, pos, pos - row_number() OVER " +
        "(PARTITION BY doc_id ORDER BY pos) AS chain FROM tk " +
        "WHERE w NOT IN ('the','a','an','of','and','to','in','is'," +
        "'that','it','for','on','with','as','was','at','by')), " +
        "ph AS (SELECT doc_id, chain, " +
        "array_to_string(list(w ORDER BY pos), ' ') AS phrase, " +
        "count(*) AS len FROM ns GROUP BY doc_id, chain), " +
        "mem AS (SELECT ns.doc_id, ns.chain, ns.w, ph.len FROM ns " +
        "JOIN ph USING (doc_id, chain)), " +
        "st AS (SELECT w, count(*) AS freq, " +
        "CAST(sum(len) AS BIGINT) AS degree FROM mem GROUP BY w), " +
        "sc AS (SELECT doc_id, chain, " +
        "sum(CAST(CAST(degree AS DOUBLE) / freq AS DECIMAL(28,14))) " +
        "AS s FROM mem JOIN st USING (w) GROUP BY doc_id, chain), " +
        "g AS (SELECT phrase, CAST(max(len) AS BIGINT) AS n_words, " +
        "count(*) AS n_occurrences, " +
        "round(CAST(max(s) AS DOUBLE), 4) AS rake_score " +
        "FROM ph JOIN sc USING (doc_id, chain) GROUP BY phrase) " +
        "SELECT phrase, n_words, n_occurrences, rake_score FROM g " +
        "ORDER BY rake_score DESC, phrase LIMIT 100"),
    // identical rank construction (row_number over cnt desc, term),
    // identical ln operands, DECIMAL(28,14)-quantized sums, identical
    // closed-form OLS arithmetic on the five sums
    "t27_zipf_fit" ->
      ("WITH tk AS (SELECT unnest(list_filter(string_split_regex(" +
        "trim(lower(text)), '\\s+'), t -> t <> '')) AS term " +
        "FROM documents), " +
        "f AS (SELECT term, count(*) AS cnt FROM tk GROUP BY term), " +
        "r AS (SELECT term, cnt, row_number() OVER " +
        "(ORDER BY cnt DESC, term) AS rank FROM f), " +
        "xy AS (SELECT cnt, ln(CAST(rank AS DOUBLE)) AS x, " +
        "ln(CAST(cnt AS DOUBLE)) AS y FROM r), " +
        "sums AS (SELECT count(*) AS n, " +
        "CAST(sum(cnt) AS BIGINT) AS toks, " +
        "CAST(sum(CAST(x AS DECIMAL(28,14))) AS DOUBLE) AS sx, " +
        "CAST(sum(CAST(y AS DECIMAL(28,14))) AS DOUBLE) AS sy, " +
        "CAST(sum(CAST(x * y AS DECIMAL(28,14))) AS DOUBLE) AS sxy, " +
        "CAST(sum(CAST(x * x AS DECIMAL(28,14))) AS DOUBLE) AS sxx " +
        "FROM xy) " +
        "SELECT n AS vocab_size, toks AS total_tokens, " +
        "round((n * sxy - sx * sy) / (n * sxx - sx * sx), 4) " +
        "AS zipf_slope, " +
        "round((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) " +
        "/ n, 4) AS zipf_intercept FROM sums"),
    // relational replay of the one-pass CharEntropyStats expression:
    // per-code-point counts (string_split('') = code points, matching
    // the expression's codePointAt loop), p*ln(p) terms quantized to
    // DECIMAL(28,14) (the t12 recipe) and summed exactly, so the total
    // is iteration-order-independent on both sides
    "t24_char_entropy" ->
      ("WITH ch AS (SELECT doc_id, unnest(string_split(text, '')) AS c " +
        "FROM documents), " +
        "n AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_chars, " +
        "CAST(count(DISTINCT c) AS BIGINT) AS n_distinct FROM ch " +
        "GROUP BY doc_id), " +
        "f AS (SELECT doc_id, c, count(*) AS k FROM ch GROUP BY doc_id, c), " +
        "t AS (SELECT f.doc_id, CAST((CAST(k AS DOUBLE) / n.n_chars) * " +
        "ln(CAST(k AS DOUBLE) / n.n_chars) AS DECIMAL(28,14)) AS term " +
        "FROM f JOIN n USING (doc_id)) " +
        "SELECT d.doc_id, coalesce(n.n_chars, 0) AS n_chars, " +
        "coalesce(n.n_distinct, 0) AS n_distinct, " +
        "round(-CAST(coalesce(sum(t.term), 0) AS DOUBLE), 4) AS entropy " +
        "FROM documents d LEFT JOIN n USING (doc_id) " +
        "LEFT JOIN t ON t.doc_id = d.doc_id " +
        "GROUP BY d.doc_id, n.n_chars, n.n_distinct ORDER BY d.doc_id"),
    // identical 3-token tiling (1-based inclusive list slice == Spark
    // slice), df over distinct docs, strip at df>=3, in-order reassembly
    "t23_boilerplate" ->
      ("WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w " +
        "FROM documents), " +
        "ex AS (SELECT doc_id, w, unnest(range(0, " +
        "CAST(ceil(len(w) / 3.0) AS BIGINT))) AS i FROM toks), " +
        "tiles AS (SELECT doc_id, i, " +
        "array_to_string(w[(i*3+1):(i*3+3)], ' ') AS t FROM ex), " +
        "hot AS (SELECT t FROM tiles GROUP BY t " +
        "HAVING count(DISTINCT doc_id) >= 3), " +
        "kept AS (SELECT doc_id, i, t FROM tiles " +
        "WHERE t NOT IN (SELECT t FROM hot)), " +
        "reb AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept, " +
        "string_agg(t, ' ' ORDER BY i) AS clean_text FROM kept " +
        "GROUP BY doc_id), " +
        "tot AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tiles " +
        "FROM tiles GROUP BY doc_id) " +
        "SELECT tot.doc_id, tot.n_tiles, " +
        "CAST(coalesce(reb.n_kept, 0) AS BIGINT) AS n_kept, " +
        "coalesce(reb.clean_text, '') AS clean_text " +
        "FROM tot LEFT JOIN reb ON tot.doc_id = reb.doc_id " +
        "ORDER BY tot.doc_id"),
    // identical md5-prefix bucket/sign arithmetic; sum cast to BIGINT
    "t22_feature_hash" ->
      ("WITH d AS (SELECT doc_id, lower(text) AS text FROM documents " +
        "WHERE doc_id % 101 = 0), " +
        s"tk AS (SELECT doc_id, unnest($duckTokens) AS token FROM d), " +
        "h AS (SELECT doc_id, " +
        "CAST(('0x' || substr(md5(token), 1, 4)) AS BIGINT) % 64 " +
        "AS bucket, " +
        "CASE WHEN CAST(('0x' || substr(md5(token), 5, 1)) AS BIGINT) % 2 " +
        "= 0 THEN 1 ELSE -1 END AS sgn FROM tk) " +
        "SELECT doc_id, bucket, CAST(sum(sgn) AS BIGINT) AS val, " +
        "count(*) AS n_tokens FROM h GROUP BY doc_id, bucket " +
        "ORDER BY doc_id, bucket"),
    // the g01 fixed-point PageRank unroll over the word-adjacency graph
    // (UNION = symmetrize + dedup, matching Spark's union().distinct())
    "t21_textrank" ->
      (s"WITH f AS (SELECT $duckTokens AS tk FROM documents), " +
        "bgx AS (SELECT tk[i] AS x, tk[i + 1] AS y FROM f, " +
        "unnest(generate_series(1, len(tk) - 1)) AS t(i) " +
        "WHERE len(tk) >= 2), " +
        "fwd AS (SELECT DISTINCT x, y FROM bgx WHERE x <> y), " +
        "e AS (SELECT x AS src, y AS dst FROM fwd " +
        "UNION SELECT y, x FROM fwd), " +
        AnalyticsQueries.pagerankUnrollSql(5) +
        " SELECT node AS word, CAST(pr AS BIGINT) AS pr FROM r5 " +
        "ORDER BY pr DESC, word LIMIT 20"),
    // identical division-chain shape both sides; ranks decided by exact
    // counts only
    "t20_collocations" ->
      (s"WITH f AS (SELECT $duckTokens AS tk FROM documents), " +
        "uni AS (SELECT unnest(tk) AS w FROM f), " +
        "u AS (SELECT w, count(*) AS cu FROM uni GROUP BY w), " +
        "bgx AS (SELECT tk[i] AS x, tk[i + 1] AS y FROM f, " +
        "unnest(generate_series(1, len(tk) - 1)) AS t(i) " +
        "WHERE len(tk) >= 2), " +
        "bg AS (SELECT x, y, count(*) AS c_xy FROM bgx GROUP BY x, y), " +
        "nb AS (SELECT sum(c_xy) AS n_bg FROM bg), " +
        "nu AS (SELECT sum(cu) AS n_ug FROM u) " +
        "SELECT bg.x, bg.y, c_xy, ux.cu AS c_x, uy.cu AS c_y, " +
        "round((CAST(c_xy AS DOUBLE) / CAST(n_bg AS DOUBLE)) / " +
        "((CAST(ux.cu AS DOUBLE) / CAST(n_ug AS DOUBLE)) * " +
        "(CAST(uy.cu AS DOUBLE) / CAST(n_ug AS DOUBLE))), 4) AS lift " +
        "FROM bg JOIN u ux ON ux.w = bg.x JOIN u uy ON uy.w = bg.y " +
        "CROSS JOIN nb CROSS JOIN nu WHERE c_xy >= 10 " +
        "ORDER BY c_xy DESC, bg.x, bg.y LIMIT 30"),
    // every threshold is a cross-multiplied integer comparison — flags
    // replay bit-for-bit (no float thresholds to drift)
    "t19_gopher_rules" ->
      (s"WITH f AS (SELECT doc_id, $duckTokens AS tk FROM documents), " +
        "c AS (SELECT doc_id, CAST(len(tk) AS BIGINT) AS n_words, " +
        "CAST(coalesce(list_aggregate(list_transform(tk, t -> length(t)), " +
        "'sum'), 0) AS BIGINT) AS sum_chars, " +
        "CAST(len(list_filter(tk, t -> regexp_matches(t, '[A-Za-z]'))) " +
        "AS BIGINT) AS n_alpha, " +
        "CAST(len(list_filter(tk, t -> list_contains(" +
        "['the','be','to','of','and','that','have','with'], lower(t)))) " +
        "AS BIGINT) AS n_stop, " +
        "CASE WHEN len(tk) >= 2 THEN list_transform(" +
        "generate_series(1, len(tk) - 1), i -> tk[i] || ' ' || tk[i + 1]) " +
        "WHEN len(tk) > 0 THEN [array_to_string(tk, ' ')] " +
        "ELSE [] END AS bg FROM f), " +
        "b AS (SELECT doc_id, n_words, sum_chars, n_alpha, n_stop, " +
        "CAST(len(bg) AS BIGINT) AS n_bigrams, " +
        "CAST(len(bg) - len(list_distinct(bg)) AS BIGINT) " +
        "AS n_dup_bigrams FROM c) " +
        "SELECT doc_id, n_words, sum_chars, n_alpha, n_stop, n_bigrams, " +
        "n_dup_bigrams, " +
        "n_words >= 50 AND n_words <= 100000 AS ok_wordcount, " +
        "sum_chars >= n_words * 3 AND sum_chars <= n_words * 10 AS ok_wordlen, " +
        "n_alpha * 5 >= n_words * 4 AS ok_alpha, " +
        "n_stop >= 2 AS ok_stop, " +
        "n_dup_bigrams * 20 <= n_bigrams * 3 AS ok_repetition, " +
        "(n_words >= 50 AND n_words <= 100000 AND " +
        "sum_chars >= n_words * 3 AND sum_chars <= n_words * 10 AND " +
        "n_alpha * 5 >= n_words * 4 AND n_stop >= 2 AND " +
        "n_dup_bigrams * 20 <= n_bigrams * 3) AS keep " +
        "FROM b ORDER BY doc_id"),
    "t01_token_counts" ->
      (s"SELECT doc_id, len($duckTokens) AS n_tokens, " +
        "len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]')) AS n_subwords " +
        "FROM documents ORDER BY doc_id LIMIT 200"),
    "t02_quality_score" ->
      (s"WITH f AS (SELECT doc_id, len($duckTokens) AS n_tokens, " +
        "CASE WHEN length(text) > 0 THEN " +
        "  CAST(length(regexp_replace(text, '[^[:punct:]]', '', 'g')) AS DOUBLE) / length(text) " +
        "ELSE 0.0 END AS punct, " +
        s"CASE WHEN len($duckTokens) > 0 THEN " +
        s"  CAST(len(list_filter($duckTokens, t -> list_contains($stop, t))) AS DOUBLE) / len($duckTokens) " +
        "ELSE 0.0 END AS stop FROM documents) " +
        "SELECT doc_id, round(least(1.0, n_tokens/100.0)*0.4 + " +
        "(1.0 - least(1.0, punct*10))*0.3 + least(1.0, stop*4)*0.3, 4) AS quality " +
        "FROM f ORDER BY doc_id LIMIT 200"),
    "t03_langid" ->
      ("WITH toks AS (SELECT doc_id, text, " +
        "list_filter(string_split_regex(trim(lower(text)), '\\s+'), t -> t <> '') AS tk " +
        "FROM documents), " +
        s"hits AS (SELECT doc_id, " +
        "length(regexp_replace(text, '[^\\x{4e00}-\\x{9fff}]', '', 'g')) AS cjk, " +
        s"$enScore AS en, $esScore AS es, $deScore AS de, $frScore AS fr " +
        "FROM toks) " +
        s"SELECT $duckLangCase AS lang_pred, " +
        "count(*) AS cnt FROM hits GROUP BY lang_pred ORDER BY lang_pred"),
    // the planted separable corpus (snippet || 12 noise tokens, same
    // construction as the Spark gate), t03's score/CASE chain with the
    // labeled lang carried through, then confusion cells + div-ppm
    // accuracy rider
    "t30_langid_eval" ->
      (langCellsCteSql + ", " +
        "a AS (SELECT CAST(sum(cnt) AS BIGINT) AS n_docs, " +
        "CAST(sum(CASE WHEN lang_true = lang_pred THEN cnt ELSE 0 END) " +
        "AS BIGINT) AS n_correct FROM cells) " +
        "SELECT lang_true, lang_pred, cnt, n_docs, n_correct, " +
        "CASE WHEN n_docs > 0 THEN (1000000 * n_correct) // n_docs END " +
        "AS accuracy_ppm FROM cells CROSS JOIN a " +
        "ORDER BY lang_true, lang_pred"),
    // same cells prefix -> per-class support/predicted/tp -> exact ppm
    // P/R + long harmonic-mean F1 (tp = 0 branch covers zero-predicted
    // classes) -> macro rider
    "t31_macro_f1" ->
      (langCellsCteSql + ", " +
        "sup AS (SELECT lang_true AS lang, " +
        "CAST(sum(cnt) AS BIGINT) AS support, " +
        "CAST(sum(CASE WHEN lang_pred = lang_true THEN cnt ELSE 0 END) " +
        "AS BIGINT) AS tp FROM cells GROUP BY 1), " +
        "prd AS (SELECT lang_pred AS lang, " +
        "CAST(sum(cnt) AS BIGINT) AS predicted FROM cells GROUP BY 1), " +
        "met AS (SELECT s.lang, s.support, " +
        "CAST(coalesce(p.predicted, 0) AS BIGINT) AS predicted, s.tp " +
        "FROM sup s LEFT JOIN prd p USING (lang)), " +
        "pr AS (SELECT lang, support, predicted, tp, " +
        "CASE WHEN predicted > 0 THEN (1000000 * tp) // predicted END " +
        "AS precision_ppm, " +
        "CASE WHEN support > 0 THEN (1000000 * tp) // support END " +
        "AS recall_ppm FROM met), " +
        "f AS (SELECT lang, support, predicted, tp, precision_ppm, " +
        "recall_ppm, CASE WHEN tp = 0 THEN 0 ELSE " +
        "(2 * precision_ppm * recall_ppm) // " +
        "(precision_ppm + recall_ppm) END AS f1_ppm FROM pr), " +
        "m AS (SELECT CAST(sum(f1_ppm) // count(*) AS BIGINT) " +
        "AS macro_f1_ppm FROM f) " +
        "SELECT lang, support, predicted, tp, precision_ppm, " +
        "recall_ppm, f1_ppm, macro_f1_ppm FROM f CROSS JOIN m " +
        "ORDER BY lang"),
    "t04_fingerprint" ->
      ("SELECT doc_id, md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp " +
        "FROM documents ORDER BY doc_id LIMIT 100"),
    "t05_tokenize_udtf" ->
      (s"WITH tk AS (SELECT doc_id, $duckTokens AS t FROM documents " +
        "WHERE doc_id <= 3) " +
        "SELECT doc_id, CAST(generate_subscripts(t, 1) - 1 AS INT) AS pos, " +
        "unnest(t) AS token FROM tk ORDER BY doc_id, pos"),
    "t06_minhash_union" ->
      ("WITH s AS (SELECT lang, sig FROM " +
        "read_parquet('{OUT}/aux/t06_signatures/*.parquet')), " +
        "u AS (SELECT lang, generate_subscripts(sig, 1) - 1 AS pos, " +
        "unnest(sig) AS v FROM s) " +
        "SELECT lang, pos, min(v) AS v FROM u GROUP BY lang, pos " +
        "ORDER BY lang, pos"),
    "t07_vocab_topk" ->
      ("WITH tk AS (SELECT unnest(list_filter(" +
        "string_split_regex(trim(lower(text)), '\\s+'), t -> t <> '')) AS token " +
        "FROM documents) " +
        "SELECT token, count(*) AS cnt FROM tk GROUP BY token " +
        "HAVING count(*) >= 5 ORDER BY cnt DESC, token LIMIT 50"),
    "t08_repetition" ->
      (s"WITH toks AS (SELECT doc_id, $duckTokens AS tk FROM documents), " +
        "g AS (SELECT doc_id, CASE WHEN len(tk) >= 2 THEN " +
        "list_transform(range(1, len(tk)), i -> array_to_string(tk[i:i+1], ' ')) " +
        "WHEN len(tk) > 0 THEN [array_to_string(tk, ' ')] " +
        "ELSE [] END AS sh FROM toks) " +
        "SELECT doc_id, round(CASE WHEN len(sh) > 0 THEN " +
        "1.0 - len(list_distinct(sh)) * 1.0 / len(sh) ELSE 0.0 END, 4) AS rep " +
        "FROM g ORDER BY doc_id LIMIT 200"),
    // smoothed tfidf; every constant CAST to DOUBLE so DuckDB never
    // routes the arithmetic through DECIMAL (ln over a decimal quotient
    // would diverge from Spark's all-double pipeline)
    "t10_tfidf_topk" ->
      ("WITH tk AS (SELECT doc_id, unnest(list_filter(" +
        "string_split_regex(trim(lower(text)), '\\s+'), t -> t <> '')) " +
        "AS term FROM documents), " +
        "tf AS (SELECT doc_id, term, count(*) AS tf FROM tk " +
        "GROUP BY doc_id, term), " +
        "df AS (SELECT term, count(*) AS df FROM tf GROUP BY term), " +
        "n AS (SELECT count(*) AS n_docs FROM documents), " +
        "s AS (SELECT doc_id, term, tf, df, " +
        "tf * (ln((n_docs + 1) / CAST(df + 1 AS DOUBLE)) + 1) AS score, " +
        "row_number() OVER (PARTITION BY doc_id ORDER BY " +
        "tf * (ln((n_docs + 1) / CAST(df + 1 AS DOUBLE)) + 1) DESC, term) " +
        "AS rn FROM tf JOIN df USING (term) CROSS JOIN n) " +
        "SELECT doc_id, term, tf, df, round(score, 4) AS tfidf FROM s " +
        "WHERE rn <= 3 ORDER BY doc_id, term"),
    "t11_bm25" ->
      ("WITH tk AS (SELECT doc_id, list_filter(" +
        "string_split_regex(trim(lower(text)), '\\s+'), t -> t <> '') " +
        "AS tk FROM documents), " +
        "st AS (SELECT count(*) AS n_docs, avg(len(tk)) AS avgdl FROM tk), " +
        "e AS (SELECT doc_id, len(tk) AS dl, unnest(tk) AS term FROM tk), " +
        "tf AS (SELECT doc_id, dl, term, count(*) AS tf FROM e " +
        "WHERE term IN ('dup', 'spark', 'join') GROUP BY doc_id, dl, term), " +
        "df AS (SELECT term, count(*) AS df FROM tf GROUP BY term), " +
        "s AS (SELECT doc_id, dl, CAST(sum(CAST(" +
        "ln(1 + (n_docs - df + CAST(0.5 AS DOUBLE)) / (df + CAST(0.5 AS DOUBLE))) * " +
        "(tf * CAST(2.2 AS DOUBLE)) / " +
        "(tf + CAST(1.2 AS DOUBLE) * (CAST(0.25 AS DOUBLE) + " +
        "CAST(0.75 AS DOUBLE) * dl / avgdl)) AS DECIMAL(28,14))) " +
        "AS DOUBLE) AS score " +
        "FROM tf JOIN df USING (term) CROSS JOIN st GROUP BY doc_id, dl) " +
        "SELECT doc_id, dl, round(score, 4) AS score FROM " +
        "(SELECT * FROM s ORDER BY s.score DESC, doc_id LIMIT 20) " +
        "ORDER BY doc_id"),
    // same tokenization; sentence runs and vowel-group syllables via
    // regexp_extract_all counts (both engines count non-overlapping
    // matches identically); identical double formula + round(4)
    "t26_readability" ->
      (s"WITH f AS (SELECT doc_id, text, $duckTokens AS tk " +
        "FROM documents), " +
        "c AS (SELECT doc_id, CAST(len(tk) AS BIGINT) AS n_words, " +
        "CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1) " +
        "AS BIGINT) AS n_sentences, " +
        "CAST(coalesce(list_aggregate(list_transform(tk, w -> " +
        "greatest(len(regexp_extract_all(lower(w), '[aeiouy]+')), 1)), " +
        "'sum'), 0) AS BIGINT) AS n_syllables FROM f) " +
        "SELECT doc_id, n_words, n_sentences, n_syllables, " +
        "round(206.835 - 1.015 * (CAST(n_words AS DOUBLE) / n_sentences) " +
        "- 84.6 * (CAST(n_syllables AS DOUBLE) / n_words), 4) AS flesch " +
        "FROM c WHERE n_words > 0 ORDER BY doc_id LIMIT 200"),
    // same tokenize/bigram CTEs as t16 plus the KN statistics; the
    // double chain mirrors the Spark expr TEXTUALLY (same casts, same
    // parenthesization), terms decimal-quantized before the sum
    "t25_kneser_ney" ->
      ("WITH tk AS (SELECT doc_id, list_filter(" +
        "string_split_regex(trim(lower(text)), '\\s+'), t -> t <> '') " +
        "AS tk FROM documents), " +
        "t2 AS (SELECT doc_id, tk FROM tk WHERE len(tk) >= 2), " +
        "bi AS (SELECT doc_id, unnest(list_transform(" +
        "range(1, len(tk)), i -> [tk[i], tk[i + 1]])) AS p FROM t2), " +
        "pairs AS (SELECT doc_id, p[1] AS a, p[2] AS b FROM bi), " +
        "c AS (SELECT a, b, count(*) AS cnt FROM pairs GROUP BY a, b), " +
        "cx AS (SELECT a, sum(cnt) AS ctot, count(*) AS fan FROM c " +
        "GROUP BY a), " +
        "cb AS (SELECT b, count(*) AS cont FROM c GROUP BY b), " +
        "ty AS (SELECT count(*) AS tt FROM c) " +
        "SELECT doc_id, count(*) AS n_bigrams, " +
        "round(-CAST(sum(CAST(ln(" +
        "greatest(CAST(cnt AS DOUBLE) - CAST(0.75 AS DOUBLE), " +
        "CAST(0 AS DOUBLE)) / ctot + " +
        "(CAST(0.75 AS DOUBLE) * CAST(fan AS DOUBLE) / ctot) * " +
        "(CAST(cont AS DOUBLE) / tt)" +
        ") AS DECIMAL(28,14))) AS DOUBLE) / count(*), 4) AS kn_score " +
        "FROM pairs JOIN c USING (a, b) JOIN cx USING (a) " +
        "JOIN cb USING (b) CROSS JOIN ty " +
        "GROUP BY doc_id ORDER BY doc_id LIMIT 200"),
    "t16_bigram_surprisal" ->
      ("WITH tk AS (SELECT doc_id, list_filter(" +
        "string_split_regex(trim(lower(text)), '\\s+'), t -> t <> '') " +
        "AS tk FROM documents), " +
        "t2 AS (SELECT doc_id, tk FROM tk WHERE len(tk) >= 2), " +
        "bi AS (SELECT doc_id, unnest(list_transform(" +
        "range(1, len(tk)), i -> [tk[i], tk[i + 1]])) AS p FROM t2), " +
        "pairs AS (SELECT doc_id, p[1] AS a, p[2] AS b FROM bi), " +
        "c AS (SELECT a, b, count(*) AS cnt FROM pairs GROUP BY a, b), " +
        "cx AS (SELECT a, sum(cnt) AS ctx FROM c GROUP BY a) " +
        "SELECT doc_id, count(*) AS n_bigrams, " +
        "round(-CAST(sum(CAST(ln(cnt / CAST(ctx AS DOUBLE)) " +
        "AS DECIMAL(28,14))) AS DOUBLE) / count(*), 4) " +
        "AS bigram_surprisal FROM pairs " +
        "JOIN c USING (a, b) JOIN cx USING (a) " +
        "GROUP BY doc_id ORDER BY doc_id LIMIT 200"),
    "t12_surprisal" ->
      ("WITH tk AS (SELECT doc_id, unnest(list_filter(" +
        "string_split_regex(trim(lower(text)), '\\s+'), t -> t <> '')) " +
        "AS term FROM documents), " +
        "f AS (SELECT term, count(*) AS cnt FROM tk GROUP BY term), " +
        "tot AS (SELECT count(*) AS total FROM tk), " +
        "j AS (SELECT doc_id, cnt, total FROM tk JOIN f USING (term) " +
        "CROSS JOIN tot) " +
        "SELECT doc_id, count(*) AS n_tokens, " +
        "round(-CAST(sum(CAST(ln(cnt / CAST(total AS DOUBLE)) " +
        "AS DECIMAL(28,14))) AS DOUBLE) / count(*), 4) " +
        "AS surprisal FROM j GROUP BY doc_id ORDER BY doc_id LIMIT 200"),
    // identical plant construction + identical regexes (character
    // classes / bounded repetition / \b only — Java and RE2 agree);
    // DuckDB needs the explicit 'g' flag Spark applies implicitly
    "t09_pii_redact" ->
      ("WITH p AS (SELECT doc_id, text || ' contact u' || doc_id || " +
        "'@ex-co.io from 10.0.' || (doc_id % 256) || " +
        "'.7 tel 555-123-4567 end' AS t FROM documents) " +
        "SELECT doc_id, regexp_replace(regexp_replace(regexp_replace(t, " +
        "'[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'), " +
        "'\\b\\d{1,3}(\\.\\d{1,3}){3}\\b', '<IP>', 'g'), " +
        "'\\b\\d{3}[-. ]\\d{3}[-. ]\\d{4}\\b', '<PHONE>', 'g') AS redacted " +
        "FROM p ORDER BY doc_id LIMIT 100"),
    // same tokenization as t01; DuckDB list slicing is 1-based
    // inclusive and clamps past the end, mirroring Spark's
    // slice(arr, start, length) truncation at the final chunk
    "t13_chunking" ->
      ("WITH w AS (SELECT doc_id, " +
        "list_filter(string_split_regex(trim(text), '\\s+'), t -> t <> '') " +
        "AS ws FROM documents), " +
        "nz AS (SELECT doc_id, ws, len(ws) AS n FROM w WHERE len(ws) > 0), " +
        "st AS (SELECT doc_id, ws, " +
        "unnest(generate_series(0, n - 1, 40)) AS s FROM nz), " +
        "c AS (SELECT doc_id, ws[s + 1 : s + 50] AS cw FROM st) " +
        "SELECT doc_id, count(*) AS n_chunks, " +
        "CAST(sum(len(cw)) AS BIGINT) AS chunk_words, " +
        "CAST(sum(CAST(('0x' || substr(md5(array_to_string(cw, ' ')), 1, 8)) " +
        "AS BIGINT)) AS BIGINT) AS fp " +
        "FROM c GROUP BY doc_id ORDER BY doc_id"),
    "t14_inverted_index" ->
      ("WITH raw AS (SELECT doc_id, " +
        "unnest(list_filter(string_split_regex(trim(lower(text)), '\\s+'), " +
        "t -> t <> '')) AS token FROM documents), " +
        "tok AS (SELECT DISTINCT doc_id, token FROM raw), " +
        "dfs AS (SELECT token, CAST(count(*) AS BIGINT) AS df FROM tok " +
        "GROUP BY token HAVING count(*) BETWEEN 5 AND 400) " +
        "SELECT token, df, " +
        "array_to_string(list(doc_id ORDER BY doc_id), ',') AS postings " +
        "FROM tok JOIN dfs USING (token) " +
        "GROUP BY token, df ORDER BY token"),
    // golden-fixture oracle: iterative argmax-merge is not
    // SQL-expressible, so the expected merges are COMMITTED (verified
    // by BpeTrainSpec's distributed==in-memory-reference property) and
    // keyed by a corpus discriminator — a trainer regression now
    // hash-fails instead of passing rows-only. An sf absent from the
    // fixture yields 0 oracle rows, i.e. a loud red, not a silent pass.
    "t15_bpe_merges" ->
      ("SELECT CAST(merge_idx AS INT) AS merge_idx, a, b FROM " +
        "read_csv('" + graft.GraftSession.fixture("t15_golden_merges.csv") +
        "', header=true) " +
        "WHERE corpus_chars = (SELECT sum(length(text)) FROM documents) " +
        "ORDER BY merge_idx"),
    // full NB replay: same tokenization, (word,class) counts, smoothed
    // log-score algebra (k=0 terms vanish -> inner join), same argmax
    // tie-break (score DESC, label ASC)
    "t18_nb_confusion" ->
      ("WITH t AS (SELECT doc_id, unnest(list_filter(string_split_regex(" +
        "trim(lower(text)), '\\s+'), w -> w <> '')) AS word " +
        "FROM documents), " +
        "lbl AS (SELECT doc_id, lang AS label FROM documents), " +
        "tl AS (SELECT t.doc_id, word, label FROM t JOIN lbl USING (doc_id)), " +
        "wc AS (SELECT word, label, count(*) AS k FROM tl " +
        "GROUP BY word, label), " +
        "cs AS (SELECT label, count(*) AS tokens_c FROM tl GROUP BY label), " +
        "dc AS (SELECT lang AS label, count(*) AS docs_c FROM documents " +
        "GROUP BY lang), " +
        "v AS (SELECT count(DISTINCT word) AS vs FROM wc), " +
        "d AS (SELECT count(*) AS dn FROM documents), " +
        "dw AS (SELECT doc_id, word, count(*) AS cnt FROM t " +
        "GROUP BY doc_id, word), " +
        "nd AS (SELECT doc_id, sum(cnt) AS n_d FROM dw GROUP BY doc_id), " +
        "hits AS (SELECT doc_id, label, sum(cnt * ln(k + 1)) AS hit " +
        "FROM dw JOIN wc USING (word) GROUP BY doc_id, label), " +
        "scored AS (SELECT nd.doc_id, cs.label, " +
        "ln(dc.docs_c * 1.0 / d.dn) " +
        "- nd.n_d * ln(cs.tokens_c + v.vs) " +
        "+ coalesce(hits.hit, 0) AS score " +
        "FROM nd CROSS JOIN cs JOIN dc USING (label) " +
        "CROSS JOIN v CROSS JOIN d " +
        "LEFT JOIN hits ON hits.doc_id = nd.doc_id " +
        "AND hits.label = cs.label), " +
        "pred AS (SELECT doc_id, label AS pred FROM (" +
        "SELECT doc_id, label, row_number() OVER (PARTITION BY doc_id " +
        "ORDER BY score DESC, label ASC) AS rn FROM scored) WHERE rn = 1) " +
        "SELECT lbl.label AS truth, pred.pred, count(*) AS n " +
        "FROM lbl JOIN pred USING (doc_id) " +
        "GROUP BY truth, pred.pred ORDER BY truth, pred.pred"),
    // replay the corpus plumbing from the pieces fixture: same
    // trim/lower/whitespace tokenization, join, ORDER BY pos reassembly
    "t17_bpe_encode" ->
      ("WITH p AS (SELECT word, pieces FROM " +
        "read_parquet('{OUT}/aux/t17_pieces/*.parquet')), " +
        "d AS (SELECT doc_id, list_filter(string_split_regex(" +
        "trim(lower(text)), '\\s+'), t -> t <> '') AS tk FROM documents), " +
        "w AS (SELECT doc_id, unnest(generate_series(1, len(tk))) AS pos, " +
        "tk FROM d), " +
        "w2 AS (SELECT doc_id, pos, tk[pos] AS word FROM w), " +
        "j AS (SELECT doc_id, pos, pieces FROM w2 JOIN p USING (word)), " +
        "f AS (SELECT doc_id, flatten(list(pieces ORDER BY pos)) AS ps " +
        "FROM j GROUP BY doc_id) " +
        "SELECT doc_id, CAST(len(ps) AS BIGINT) AS n_pieces, " +
        "md5(array_to_string(ps, ' ')) AS pieces_fp " +
        "FROM f ORDER BY doc_id"),
  )
}
