package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => T}

/** Sliding-window document chunking — the retrieval/embedding prep
  * step of an LLM data pipeline: each document becomes overlapping
  * word-window chunks (window `window` words, advancing `stride` words,
  * so consecutive chunks share `window - stride` words of context; the
  * final chunk may be shorter).
  *
  * Scale shape: a pure generate — tokenize once, `posexplode` the
  * start offsets, `slice` the token array. No shuffle at all: chunking
  * 100 TB of documents is map-only and pipelines into the downstream
  * embed/write without an exchange. Output rows carry (id, chunk_idx,
  * chunk_text, n_words); chunk ids are dense per document, so
  * (id, chunk_idx) is a stable chunk key for incremental re-embedding.
  */
object Chunker {

  /** One row per (document, window start): `chunk_idx` counts 0,1,…
    * per document, `chunk_text` re-joins the window's tokens with a
    * single space (tokenization is whitespace-split, so re-join is
    * lossless up to whitespace runs), `n_words` is the window's actual
    * token count (< `window` only for the final partial chunk).
    * Documents with no tokens yield no chunks (explode, not
    * explode_outer — mirrors P1's empty-line_items semantics). */
  def chunk(df: DataFrame, idCol: String, textCol: String,
      window: Int, stride: Int): DataFrame = {
    require(window > 0, s"window must be positive: $window")
    require(stride > 0 && stride <= window,
      s"stride must be in [1, window]: stride=$stride window=$window")
    df
      .select(col(idCol), T.tokens(col(textCol)).as("__w"))
      .filter(size(col("__w")) > 0)
      .select(col(idCol), col("__w"),
        posexplode(sequence(lit(0), size(col("__w")) - 1, lit(stride)))
          .as(Seq("chunk_idx", "__st")))
      .select(col(idCol), col("chunk_idx"),
        slice(col("__w"), col("__st") + 1, lit(window)).as("__cw"))
      .select(col(idCol), col("chunk_idx"),
        array_join(col("__cw"), " ").as("chunk_text"),
        size(col("__cw")).as("n_words"))
  }
}
