package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** RAKE keyword extraction (Rose, Engel, Cramer & Cowley, "Automatic
  * keyword extraction from individual documents", 2010): candidate
  * keywords are the maximal runs of non-stopword tokens (stopwords act
  * as phrase delimiters), scored by summing each member word's
  * `degree/frequency` — degree counts the total length of every phrase
  * occurrence the word appears in, so words that live in long phrases
  * outrank equally-frequent words that appear alone. The unsupervised
  * keyword baseline next to TextRank (t21): no graph iteration, two
  * aggregations.
  *
  * Exactness: phrase runs come from the gaps-and-islands chain key
  * (`pos − row_number`, the d11 discipline — both engines compute the
  * identical integer), word stats are integer, each `degree/freq`
  * term is quantized DECIMAL(28,14) before the exact per-phrase sum
  * (t12 recipe), and the top-k ranks on the 4-digit rounding with the
  * phrase text as tie-break.
  *
  * Scale shape: one token explode, ONE (doc, chain) aggregation whose
  * rows carry both the phrase text and its member-word array (phrase
  * membership re-derives by explode — no join back to the token
  * frame), one vocab-sized stats aggregation joined unhinted into the
  * scoring pass — AQE broadcast-converts it at runtime while the
  * vocabulary is actually small, and a Heaps-law web-scale corpus
  * falls back to a shuffled equi-join instead of OOMing a forced
  * hint — one phrase-text aggregation, top-k via
  * TakeOrderedAndProject. No self-joins, nothing driver-side.
  */
object Rake {

  /** Corpus-wide top-`k` RAKE keywords. Output: (phrase, n_words,
    * n_occurrences, rake_score), score desc, phrase tie-break.
    * Identical phrase texts share one row (same member multiset ⟹
    * identical score by construction). */
  def keywords(docs: DataFrame, idCol: String, textCol: String,
      stopwords: Seq[String] = TextFunctions.enStopwordList,
      topK: Int = 100): DataFrame = {
    val toks = docs.select(col(idCol).as("doc"),
      posexplode(TextFunctions.tokens(lower(col(textCol))))
        .as(Seq("pos", "w")))
    val ns = toks.filter(!col("w").isin(stopwords: _*))
      .withColumn("_chain", col("pos") - row_number().over(
        Window.partitionBy("doc").orderBy("pos")))
    // ONE phrase rollup carries the member-word ARRAY alongside the
    // joined text, so phrase membership re-derives by explode instead
    // of a join back to the token frame (the r7 verdict's fuse-the-
    // passes drill: the r7 shape checkpointed ns, joined it to phrases
    // on (doc, chain), shuffled members by word for the stats join,
    // and shuffled back — two corpus-sized exchanges gone).
    val phrases = ns.groupBy("doc", "_chain")
      .agg(transform(
          sort_array(collect_list(struct(col("pos"), col("w")))),
          e => e.getField("w")).as("words"),
        count(lit(1)).as("len"))
      .withColumn("phrase", array_join(col("words"), " "))
      .localCheckpoint(true) // feeds stats, scoring, and the text rollup
    val members = phrases.select(col("doc"), col("_chain"), col("len"),
      explode(col("words")).as("w"))
    val stats = members.groupBy("w")
      .agg(count(lit(1)).as("freq"), sum(col("len")).as("degree"))
    // vocab-sized, which on a web-scale corpus is Heaps-law UNBOUNDED —
    // a forced broadcast hint (Spark obeys it regardless of size) would
    // OOM the driver there, so the join is unhinted: AQE observes the
    // actual stats shuffle at runtime and converts to broadcast when it
    // is genuinely small (the common case), falling back to a shuffled
    // equi-join when the vocabulary outgrows it — same values either way
    val scored = members.join(stats, "w")
      .withColumn("_t", (col("degree").cast("double") / col("freq"))
        .cast("decimal(28,14)"))
      .groupBy("doc", "_chain")
      .agg(sum(col("_t")).as("_sc"))
    phrases.join(scored, Seq("doc", "_chain"))
      .groupBy("phrase")
      .agg(max(col("len")).as("n_words"),
        count(lit(1)).as("n_occurrences"),
        max(col("_sc")).as("_sc")) // equal-text occurrences carry the
                                   // identical exact-decimal score
      .select(col("phrase"), col("n_words"), col("n_occurrences"),
        round(col("_sc").cast("double"), 4).as("rake_score"))
      .orderBy(col("rake_score").desc, col("phrase"))
      .limit(topK)
  }
}
