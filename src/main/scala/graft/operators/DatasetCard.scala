package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => T}

/** Corpus arrival datasheet — the one-pass per-language + overall
  * summary a 100 TB drop gets before anything else runs ("Datasheets
  * for Datasets", Gebru et al. 2021, the quantitative half): volume,
  * source breadth, token mass, and exact-duplicate pressure, each the
  * number that decides which downstream pass (dedup? lang rebalance?
  * quota) runs first.
  *
  * Scale shape: ONE rollup aggregate over the corpus — per-lang rows
  * and the ALL row come from the same partial aggregation (no second
  * scan for totals); token counts reuse the t01 tokenizer expression
  * (codegen'd, no UDF), exact-dup pressure reuses the d01 fingerprint
  * so card numbers and dedup behavior cannot disagree. The two
  * count-distincts expand the aggregate (Spark's Expand), which is
  * the standard cost of exact distincts; swap in the HLL sketch
  * (q45) when approximate suffices at full scale.
  */
object DatasetCard {

  /** One row per language + an 'ALL' rollup row: (lang, is_total,
    * n_docs, n_sources, total_chars, total_tokens, n_unique_texts,
    * dup_rows). `is_total` carries the grouping flag so the rollup row
    * is structurally distinguishable even from a genuine lang value
    * "ALL". NULL text fingerprints to a sentinel so null-text docs
    * still count as (one) unique text; NULL langs form their own row,
    * distinct from the total. */
  def report(docs: DataFrame): DataFrame =
    docs
      .select(col("lang"), col("source"),
        coalesce(col("n_chars"), lit(0L)).as("chars"),
        coalesce(T.tokenCount(col("text")), lit(0)).cast("long")
          .as("toks"),
        coalesce(T.fingerprint(col("text")), lit("NULLTEXT")).as("fp"))
      .rollup(col("lang"))
      .agg(grouping(col("lang")).as("_g"),
        count(lit(1)).as("n_docs"),
        countDistinct(col("source")).as("n_sources"),
        sum(col("chars")).cast("long").as("total_chars"),
        sum(col("toks")).cast("long").as("total_tokens"),
        countDistinct(col("fp")).as("n_unique_texts"))
      .select(
        when(col("_g") === 1, lit("ALL")).otherwise(col("lang"))
          .as("lang"),
        (col("_g") === 1).as("is_total"),
        col("n_docs"), col("n_sources"), col("total_chars"),
        col("total_tokens"), col("n_unique_texts"),
        (col("n_docs") - col("n_unique_texts")).as("dup_rows"))
}
