package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The hashing trick (Weinberger et al. 2009): map tokens into a
  * FIXED feature dimension with a hash, no vocabulary pass, no
  * dictionary state — the featurizer that never needs a fit step, so
  * it streams and shards trivially at corpus scale. The signed
  * variant sums a ±1 per token (second hash) so collisions cancel in
  * expectation instead of biasing counts upward.
  *
  * Hashes are md5-prefix integers (the [[DataSplit]] portability
  * discipline): bucket = first 4 hex chars mod `dim`, sign = parity
  * of the 5th hex char — replayable in any engine with md5, which is
  * what lets the t22 gate hash-match DuckDB bit-for-bit.
  *
  * Scale shape: a pure per-row projection (codegen'd md5 + conv) into
  * one (id, bucket)-keyed count/sum aggregate with map-side partials.
  * The feature matrix never exists densely; output is the sparse
  * (id, bucket, val) triple frame a trainer consumes.
  */
object FeatureHash {

  /** Hash bucket in [0, dim): first 4 md5 hex chars mod dim. */
  def hashBucket(token: Column, dim: Int): Column =
    conv(substring(md5(token), 1, 4), 16, 10).cast("long") % dim

  /** ±1 sign from the parity of the 5th md5 hex char. */
  def sign(token: Column): Column =
    when(conv(substring(md5(token), 5, 1), 16, 10).cast("long") % 2 === 0,
      lit(1L)).otherwise(lit(-1L))

  /** Sparse signed feature vectors from (id, token) rows:
    * (id, bucket, val, n_tokens) with val = Σ sign(token) over the
    * bucket's tokens and n_tokens the collision-inclusive count. */
  def sparseVectors(tokens: DataFrame, id: String, token: String,
      dim: Int): DataFrame = {
    require(dim >= 1, "feature dimension must be >= 1")
    tokens
      .select(col(id), hashBucket(col(token), dim).as("bucket"),
        sign(col(token)).as("sgn"))
      .groupBy(col(id), col("bucket"))
      .agg(sum(col("sgn")).as("val"), count(lit(1)).as("n_tokens"))
  }
}
