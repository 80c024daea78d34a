package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-frequency boilerplate removal — the C4/RefinedWeb cleanup
  * step (Raffel et al. 2020 removed any three-sentence span occurring
  * more than once in the corpus; RefinedWeb strips lines repeated
  * across pages — nav bars, cookie banners, license footers): a span
  * that appears in many documents is template, not content, and gets
  * REMOVED while the surviving text is reassembled in order.
  *
  * This operator is the rewrite form of what [[Dedup.dupSpans]] only
  * reports: documents come back CLEANED, one row per input doc (docs
  * whose every tile was boilerplate survive with empty text — the
  * downstream length filter is where they die, keeping each rule
  * observable on its own).
  *
  * Tiling is fixed non-overlapping `tile`-token windows (the flat-text
  * stand-in for sentences/lines; swap the tiler for a sentence split
  * when the corpus has real punctuation — the df-count/strip/reassemble
  * stages are unchanged).
  *
  * Scale shape: tile generation is map-only (explode+slice); the df
  * count shuffles 16-byte md5 tile keys, never text; the strip is a
  * LEFT join against the hot-tile keys (broadcastable while the
  * hot-tile table is dimension-sized — at corpus scale it stays small
  * because only tiles with df ≥ threshold are joined) whose flag feeds
  * ONE per-doc hash agg computing n_tiles, n_kept, and the reassembly
  * together (sort_array over collected (idx, tile) structs —
  * group-sized, no window sort). Two 100 TB passes over the tile
  * frame: count, then flag+agg — the r7 rewrite of a three-scan shape.
  */
object Boilerplate {

  /** Strip tiles appearing in ≥ `dropDf` distinct docs. Returns one row
    * per input doc: (id, n_tiles, n_kept, clean_text). */
  def strip(df: DataFrame, idCol: String, textCol: String,
      tile: Int, dropDf: Long): DataFrame = {
    require(tile > 0, s"tile must be positive: $tile")
    require(dropDf >= 2, s"dropDf < 2 would drop every tile: $dropDf")
    // NULL/empty text must survive as (id, 0, 0, "") like the
    // all-boilerplate docs: split("", " ") is [""] (size 1), which
    // would mint a phantom '' tile per empty doc — and enough empty
    // docs would make '' itself boilerplate. Empty docs skip tiling
    // entirely and rejoin through the base-doc left joins below.
    val base = df.select(col(idCol).as("_id"),
      coalesce(col(textCol), lit("")).as("_txt"))
    val tiles = base.filter(length(col("_txt")) > 0)
      .select(col("_id"), split(col("_txt"), " ").as("_w"))
      .select(col("_id"), col("_w"),
        posexplode(sequence(lit(0),
          ceil(size(col("_w")) / lit(tile.toDouble)).cast("long") - 1))
          .as(Seq("_i", "_n")))
      .select(col("_id"), col("_i"),
        array_join(slice(col("_w"), (col("_i") * tile + 1).cast("int"),
          lit(tile)), " ").as("_t"))
    // corpus document-frequency per tile content, keyed by md5 so the
    // shuffle moves 16-byte digests, not tile text
    val hot = tiles.groupBy(md5(col("_t")).as("_h"))
      .agg(countDistinct(col("_id")).as("_df"))
      .filter(col("_df") >= dropDf)
      .select(col("_h"), lit(1).as("_hot"))
    // one flagged pass: collect_list skips NULLs, so hot tiles vanish
    // from the reassembly while still counting toward n_tiles
    val rebuilt = tiles
      .join(hot, md5(col("_t")) === hot("_h"), "left")
      .groupBy("_id")
      .agg(count(lit(1)).as("n_tiles"),
        count(when(col("_hot").isNull, 1)).as("n_kept"),
        array_join(transform(
          sort_array(collect_list(
            when(col("_hot").isNull, struct(col("_i"), col("_t"))))),
          s => s("_t")), " ").as("clean_text"))
    base.select(col("_id"))
      .join(rebuilt, Seq("_id"), "left")
      .select(col("_id").as(idCol),
        coalesce(col("n_tiles"), lit(0L)).as("n_tiles"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }
}
