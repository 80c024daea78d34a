package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-filter seen-set for incremental dedup — "drop documents whose
  * fingerprint a prior snapshot already ingested" without ever joining
  * the new batch against the full seen-set.
  *
  * The filter is held as a DataFrame of SET BIT POSITIONS rather than a
  * driver-side bitset: k deterministic hash positions per key
  * (`pmod(xxhash64(key, i), m)`), distinct. That keeps every piece of
  * the machinery a relational operator — the bits table is bounded by m
  * regardless of how many billions of keys the seen-set holds (set bits
  * ≤ min(m, k·n)), so it broadcasts whenever that bound is actually
  * small (the `broadcastBits` flag on [[markSeen]] owns the choice —
  * a tens-of-billions-bit production filter anti-joins shuffled
  * instead); membership is an anti-join on positions; and
  * incremental maintenance is a union. Classic guarantees hold: no
  * false negatives ever; false positives at the standard
  * (1 - e^(-kn/m))^k rate, deterministic here because the hashes are
  * seeded — the same key always maps to the same positions, so a run
  * is reproducible bit-for-bit.
  *
  * Scale shape: building scans the seen-set once (explode k positions,
  * distinct — map-side combined). Marking explodes the BATCH's distinct
  * keys k ways, anti-joins the broadcast bits (a key survives iff some
  * position is unset — those are the definite-unseen), then joins that
  * verdict back to the batch by key: one shuffle of the batch, zero
  * shuffles of the seen-set.
  */
object BloomSeenSet {

  /** The k bit positions for one key (deterministic, engine-portable:
    * each is `pmod(xxhash64(key, i), m)`). */
  def bitPositions(key: Column, m: Long, numHashes: Int): Column = {
    require(m > 0 && numHashes > 0, "m and numHashes must be positive")
    array((0 until numHashes).map(i =>
      pmod(xxhash64(key, lit(i)), lit(m))): _*)
  }

  /** Build (or rebuild) the bits table from a seen-set of keys. */
  def buildBits(seen: DataFrame, keyCol: String, m: Long,
      numHashes: Int): DataFrame =
    seen.select(explode(bitPositions(col(keyCol), m, numHashes)).as("pos"))
      .distinct()

  /** Fold a new batch's keys into an existing bits table. */
  def mergeBits(bits: DataFrame, batch: DataFrame, keyCol: String,
      m: Long, numHashes: Int): DataFrame =
    bits.unionByName(buildBits(batch, keyCol, m, numHashes)).distinct()

  /** Tag every batch row with `bloom_hit`: false means PROVABLY unseen
    * (some bit position is unset), true means seen-or-false-positive.
    * Exact-match semantics follow whatever `keyCol` holds (use a
    * normalized fingerprint for content dedup).
    *
    * `broadcastBits` follows the broadcastVocab convention: set bits
    * are ≤ min(m, k·n), and at a REAL 100 TB seen-set (billions of
    * keys, m sized in the tens of billions for a sane FP rate) that
    * is billions of rows — a forced broadcast hint (Spark obeys it
    * regardless of size) would OOM the driver there. The default is
    * right for the snapshot-sized filters the gates exercise; pass
    * false at scale and the anti-join becomes a plain shuffled
    * equi-join on positions — same verdicts either way. */
  def markSeen(batch: DataFrame, keyCol: String, bits: DataFrame,
      m: Long, numHashes: Int, broadcastBits: Boolean = true): DataFrame = {
    def hint(df: DataFrame) = if (broadcastBits) broadcast(df) else df
    val pos = batch.select(col(keyCol).as("_k")).distinct()
      .select(col("_k"),
        explode(bitPositions(col("_k"), m, numHashes)).as("pos"))
    val definiteMiss = pos.join(hint(bits), Seq("pos"), "left_anti")
      .select(col("_k")).distinct()
      .withColumn("_miss", lit(1))
    // null-SAFE equality: a null key hashes like any other value (the
    // xxhash skips the null input, so all nulls share one position set);
    // plain === would never match the null verdict row back to its
    // batch rows, silently marking every null-key doc "seen"
    batch.join(definiteMiss, col(keyCol) <=> col("_k"), "left")
      .withColumn("bloom_hit", col("_miss").isNull)
      .drop("_k", "_miss")
  }

  /** Keep only rows the filter proves unseen — the incremental-crawl
    * fast path (survivors are exact-new up to the FP rate; chase with an
    * exact anti-join against the hit keys only if FPs matter). */
  def filterUnseen(batch: DataFrame, keyCol: String, bits: DataFrame,
      m: Long, numHashes: Int, broadcastBits: Boolean = true): DataFrame =
    markSeen(batch, keyCol, bits, m, numHashes, broadcastBits)
      .filter(!col("bloom_hit")).drop("bloom_hit")
}
