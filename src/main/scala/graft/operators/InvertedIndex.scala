package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Inverted index (token → postings list) over a document corpus — the
  * backbone of keyword search and a north-star extension alongside the
  * ANN/similarity family (SURVEY.md §7).
  *
  * Scale shape: document-frequency is computed FIRST with a map-side
  * combinable count, and postings are only collected for tokens inside
  * the requested df band. Head tokens (stopwords with df in the
  * millions) are excluded before any `collect_set` state exists, so
  * per-group aggregation state is bounded by `maxDf` — the same
  * cap-before-collect discipline as the dedup family's bucket caps
  * ([[Dedup.capShingleBuckets]]). Shuffles: one for the distinct
  * (token, doc) pairs, one map-combined count, one token-keyed join +
  * collect; postings rows never exceed `maxDf` entries.
  */
object InvertedIndex {

  /** Distinct (token, doc) pairs from whitespace-tokenized lowercased
    * text — one row per token occurrence per doc. Tokenization is THE
    * shared [[graft.functions.TextFunctions.tokens]] (identical
    * behavior; a second hand-rolled split here could silently drift
    * the index vocabulary from every other text operator's). */
  def tokenDocPairs(docs: DataFrame, docId: String, text: String): DataFrame =
    docs.select(col(docId).as("doc"),
        explode(graft.functions.TextFunctions.tokens(lower(col(text))))
          .as("token"))
      .distinct()

  /** Postings table for tokens with document frequency in [minDf, maxDf]:
    * (token, df, postings) with postings a comma-joined sorted doc-id
    * string (engine-portable rendering; an array column would hash
    * differently per engine canonicalizer). */
  def build(docs: DataFrame, docId: String, text: String,
      minDf: Long = 1L, maxDf: Long = Long.MaxValue): DataFrame = {
    val pairs = tokenDocPairs(docs, docId, text)
    val banded = pairs.groupBy("token")
      .agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDf && col("df") <= maxDf)
    pairs.join(banded, "token")
      .groupBy(col("token"), col("df"))
      .agg(sort_array(collect_set(col("doc"))).as("_ds"))
      .select(col("token"), col("df"),
        array_join(transform(col("_ds"), d => d.cast("string")), ",")
          .as("postings"))
  }
}
