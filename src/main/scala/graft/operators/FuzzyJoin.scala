package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fuzzy (edit-distance) entity resolution: match dirty records to a
  * canonical table when the join key is a typo away — the classic
  * record-linkage step of any ingest that merges human-entered or
  * OCR'd data.
  *
  * Never all-pairs: candidates come from an equi-join on a caller-
  * chosen blocking key (a stable substring/token/phonetic code — the
  * same discipline as d02's rarest-shingle prefixes), then two cheap
  * necessary-condition filters run BEFORE the O(len²) Levenshtein:
  * |len(a) − len(b)| ≤ maxDist (an edit changes length by ≤ 1), and
  * the blocking equality itself. At 100 TB the expensive dynamic-
  * program runs only on block-co-located, length-compatible pairs —
  * shuffle is keyed by the blocking value, and a hot block (a common
  * token) is bounded by the caller picking a more selective key, not
  * by this operator scanning cross products.
  */
object FuzzyJoin {

  /** Left (dirty) rows matched to right (canonical) rows with
    * `levenshtein(leftText, rightText) <= maxDist`, candidates drawn
    * from equality on the blocking expressions. Output: all left
    * columns, all right columns, plus `dist`. Rows with a NULL
    * blocking value never match (equi-join semantics — route them to
    * a review queue upstream if that matters). */
  def join(left: DataFrame, right: DataFrame,
      leftText: Column, rightText: Column,
      leftBlock: Column, rightBlock: Column,
      maxDist: Int): DataFrame = {
    require(maxDist >= 0, s"maxDist must be >= 0: $maxDist")
    val l = left.withColumn("__lb", leftBlock).withColumn("__lt", leftText)
    val r = right.withColumn("__rb", rightBlock).withColumn("__rt", rightText)
    l.join(r, col("__lb") === col("__rb"), "inner")
      .filter(abs(length(col("__lt")) - length(col("__rt"))) <= maxDist)
      // bounded 3-arg levenshtein: O(len·maxDist) with early exit, -1
      // beyond the bound — same distances as the full O(len²) DP for
      // every surviving pair, cheaper on long strings
      .withColumn("dist",
        levenshtein(col("__lt"), col("__rt"), maxDist))
      .filter(col("dist") >= 0)
      .drop("__lb", "__rb", "__lt", "__rt")
  }

  /** Default blocking key for word-phrase names: the LAST token — a
    * deliberate choice for corpora where corruption clusters at the
    * head of the string; swap in a phonetic code or a rare-token pick
    * when errors are uniform. */
  def lastTokenBlock(text: Column): Column = {
    // the ONE tokenizer (a byte-identical local copy would silently
    // diverge from the shingle paths on a future tokenizer fix)
    val toks = graft.functions.TextFunctions.tokens(text)
    // guard: ANSI element_at throws on an empty array; token-less
    // strings block as NULL (= never match) instead
    when(size(toks) > 0, element_at(toks, -1))
  }
}
