package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Chunk-level deduplication over content-defined chunks — the storage
  * dedup primitive for corpora of near-identical documents (crawl
  * re-fetches, boilerplate, versioned pages): documents that share long
  * byte runs share CHUNKS, even when edits shift offsets, because CDC
  * boundaries re-synchronize on content (see [[graft.plans.CdcChunks]]).
  *
  * Scale shape: chunking is a per-row projection (no shuffle); the
  * dedup accounting groups 8-byte chunk hashes + small ints — the
  * shuffle carries hashes, never chunk bytes. A content-addressed
  * store would join this table against its existing hash set (a
  * broadcast or [[BloomSeenSet]] anti-join) and ship only new chunks.
  */
object Cdc {

  /** Exploded chunk table: (id, idx, start, len, hash), one row per
    * chunk in document order; start/len are UTF-8 byte offsets. */
  def chunkTable(docs: DataFrame, idCol: String, textCol: String,
      minSize: Int = 24, maskBits: Int = 5, maxSize: Int = 128): DataFrame =
    docs.select(col(idCol),
      posexplode(TextFunctions.cdcChunks(col(textCol), minSize, maskBits,
        maxSize)).as(Seq("idx", "c")))
      .select(col(idCol), col("idx"),
        col("c.start").as("start"), col("c.len").as("len"),
        col("c.hash").as("hash"))

  /** Corpus-level dedup accounting over a [[chunkTable]]: total vs
    * distinct chunks and bytes (bytes_dedup = what a content-addressed
    * store would hold). Two aggregations + a 1-row cross join. */
  def dedupStats(chunks: DataFrame): DataFrame = {
    val tot = chunks.agg(
      count(lit(1)).as("n_chunks"),
      sum(col("len")).cast("long").as("bytes_total"))
    // min(len) per hash: under a 64-bit collision lens would disagree;
    // taking the min keeps the stat deterministic either way
    val dis = chunks.groupBy(col("hash"))
      .agg(min(col("len")).as("clen"))
      .agg(count(lit(1)).as("distinct_chunks"),
        sum(col("clen")).cast("long").as("bytes_dedup"))
    // sum() over zero rows is NULL — an empty chunk table must report
    // 0 bytes, not nulls that poison downstream ratios
    tot.crossJoin(dis).select(
      col("n_chunks"), col("distinct_chunks"),
      (col("n_chunks") - col("distinct_chunks")).as("dup_chunks"),
      coalesce(col("bytes_total"), lit(0L)).as("bytes_total"),
      coalesce(col("bytes_dedup"), lit(0L)).as("bytes_dedup"))
  }
}
