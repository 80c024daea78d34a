package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Corpus-level collocation mining: which adjacent word pairs co-occur
  * far more than chance — the PMI/lift signal phrase-extraction and
  * tokenizer-vocab curation pipelines rank multi-word expressions with
  * (Church & Hanks 1990).
  *
  * Score = lift = p(xy) / (p(x)·p(y)) with probabilities from corpus
  * counts: `(c_xy/N_bg) / ((c_x/N_ug)·(c_y/N_ug))` — the monotone core
  * of PMI (PMI = log lift) without the engine-dependent `ln`. Counts
  * are exact integers; the one float expression is a fixed-shape
  * division chain rounded to 4 digits, and the output ORDER is by exact
  * counts — floats never decide ranks.
  *
  * Scale shape: bigram/unigram generation is a per-row codegen'd
  * projection + explode (text never crosses a shuffle; only tokens do),
  * counting is one map-side-combined hash shuffle each, and the two
  * unigram joins key on the VOCAB-sized count table — broadcast it when
  * small, plain equi-join at web-vocab scale. The `minCount` floor
  * prunes the bigram tail BEFORE the joins.
  */
object Collocations {

  /** Strict adjacent bigrams as (x, y) structs; docs under 2 tokens
    * contribute none. Also the edge generator for TextRank's
    * word-adjacency graph (t21). */
  def bigramPairs(text: Column): Column =
    TextFunctions.bind(TextFunctions.tokens(text)) { tk =>
      when(size(tk) >= 2,
        transform(sequence(lit(1), size(tk) - 1),
          i => struct(element_at(tk, i).as("x"),
            element_at(tk, i + 1).as("y"))))
        .otherwise(array().cast("array<struct<x:string,y:string>>"))
    }

  /** (x, y, c_xy, c_x, c_y, lift) for every bigram with
    * `c_xy >= minCount`. */
  def lift(docs: DataFrame, textCol: String, minCount: Long): DataFrame = {
    val toks = docs.select(TextFunctions.tokens(col(textCol)).as("tk"))
    // materialize both count frames: each feeds a total AND join(s), and
    // without the checkpoint every reader re-scans the corpus — five
    // full scans where two suffice (the frames are vocab-sized)
    val uni = toks.select(explode(col("tk")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cu"))
      .localCheckpoint()
    val bg = docs.select(explode(bigramPairs(col(textCol))).as("b"))
      .select(col("b.x").as("x"), col("b.y").as("y"))
      .groupBy("x", "y").agg(count(lit(1)).as("c_xy"))
      .localCheckpoint()
    val nBg = bg.agg(sum(col("c_xy")).as("n_bg"))
    val nUg = uni.agg(sum(col("cu")).as("n_ug"))
    bg.filter(col("c_xy") >= minCount)
      .join(uni.select(col("w").as("x"), col("cu").as("c_x")), "x")
      .join(uni.select(col("w").as("y"), col("cu").as("c_y")), "y")
      .crossJoin(broadcast(nBg)).crossJoin(broadcast(nUg))
      .select(col("x"), col("y"), col("c_xy"), col("c_x"), col("c_y"),
        round(
          (col("c_xy").cast("double") / col("n_bg").cast("double")) /
            ((col("c_x").cast("double") / col("n_ug").cast("double")) *
              (col("c_y").cast("double") / col("n_ug").cast("double"))), 4)
          .as("lift"))
  }
}
