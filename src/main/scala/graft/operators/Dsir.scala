package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** DSIR-style data selection — importance weighting of a raw source
  * corpus against a small trusted TARGET distribution (Xie et al.,
  * "Data Selection for Language Models via Importance Resampling",
  * NeurIPS 2023): fit bag-of-unigram models to the target and source
  * partitions, score every source document with its log importance
  * weight `Σ_tokens [ln p_target(w) − ln p_source(w)]`, and keep the
  * top-k — the standard "make web text look like Wikipedia" selection
  * step of an LLM pretraining pipeline. (The paper hashes n-grams into
  * a fixed bucket count and samples via Gumbel noise; here features
  * are the raw unigrams — the d11 string-shingle discipline, so the
  * oracle replays them — and selection is the deterministic top-k
  * variant, like every sampler in this engine.)
  *
  * Probabilities are add-one smoothed over the JOINT vocabulary
  * (`p(w) = (c(w)+1)/(N+V)`), so source-only tokens score a finite
  * penalty instead of −∞. Exactness: both engines compute the same
  * rational operands, IEEE-divide, `ln`, and quantize each per-token
  * term to DECIMAL(28,14) before the exact sum (the t12 surprisal
  * recipe), then rank on the 4-digit rounding with a doc-id tie-break.
  *
  * Scale shape: one token explode, one vocab-sized count aggregation
  * (map-side combined), one token→vocab join + 1-row totals broadcast,
  * one per-doc aggregation, top-k via TakeOrderedAndProject. The vocab
  * frame is broadcast here (the t10/t12 family convention); at
  * web-scale vocabularies switch the broadcast for the plain shuffled
  * equi-join on `term` — same plan class as tf-idf's df join.
  */
object Dsir {

  /** Top-`k` source documents (rows NOT matching `isTarget`) by DSIR
    * log importance weight. Output: (doc, n_tokens, log_weight),
    * ranked log_weight desc then doc. Docs with no tokens are absent
    * (they carry no evidence either way). */
  def importanceTopK(docs: DataFrame, idCol: String, textCol: String,
      isTarget: Column, k: Int,
      broadcastVocab: Boolean = true): DataFrame = {
    // the counts frame is vocab-sized: caller-owned hint (tfIdfTopK
    // flag convention) instead of a forced broadcast the planner
    // cannot refuse on a Heaps-law web vocabulary
    def hint(df: DataFrame) = if (broadcastVocab) broadcast(df) else df
    val toks = docs.select(col(idCol).as("doc"), isTarget.as("is_t"),
      explode(TextFunctions.tokens(lower(col(textCol)))).as("term"))
    val counts = toks.groupBy("term").agg(
      sum(when(col("is_t"), 1L).otherwise(0L)).as("ct"),
      sum(when(!col("is_t"), 1L).otherwise(0L)).as("cs"))
    val tot = counts.agg(sum(col("ct")).as("nt"),
      sum(col("cs")).as("ns"), count(lit(1)).as("v"))
    toks.filter(!col("is_t"))
      .join(hint(counts), "term")
      .crossJoin(broadcast(tot))
      .withColumn("_term",
        (log((col("ct") + 1) / (col("nt") + col("v")).cast("double")) -
          log((col("cs") + 1) / (col("ns") + col("v")).cast("double")))
          .cast("decimal(28,14)"))
      .groupBy("doc")
      .agg(count(lit(1)).as("n_tokens"),
        round(sum(col("_term")).cast("double"), 4).as("log_weight"))
      .orderBy(col("log_weight").desc, col("doc"))
      .limit(k)
  }
}
