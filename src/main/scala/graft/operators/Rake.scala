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
  * Scale shape: one token explode, one (doc, chain) aggregation, one
  * vocab-sized stats aggregation joined back by word, one phrase-text
  * aggregation, top-k via TakeOrderedAndProject. All equi-joins on
  * token/phrase keys — no self-joins, nothing driver-side.
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
      .localCheckpoint(true) // feeds the phrase rollup AND members
    val phrases = ns.groupBy("doc", "_chain")
      .agg(array_join(transform(
          sort_array(collect_list(struct(col("pos"), col("w")))),
          e => e.getField("w")), " ").as("phrase"),
        count(lit(1)).as("len"))
      .localCheckpoint(true) // feeds members AND the final text rollup
    val members = ns
      .join(phrases.select(col("doc"), col("_chain"), col("len")),
        Seq("doc", "_chain"))
    val stats = members.groupBy("w")
      .agg(count(lit(1)).as("freq"), sum(col("len")).as("degree"))
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
