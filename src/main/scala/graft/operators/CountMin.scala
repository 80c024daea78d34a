package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch (Cormode & Muthukrishnan 2005) as a RELATIONAL
  * sketch: the summary is a (row, bucket, c) frame of at most
  * depth × width rows, built with one map-side-combinable count
  * shuffle — the key domain itself is never shuffled, which is the
  * point when the keys are 100 TB of high-cardinality ids and all you
  * need is approximate frequencies with a one-sided error bound
  * (est ≥ truth always; est ≤ truth + εN with prob 1−δ at
  * width=⌈e/ε⌉, depth=⌈ln 1/δ⌉).
  *
  * Sketches MERGE by union + re-aggregation ([[merge]]) — the shape
  * that lets per-day/per-shard sketches roll up without touching raw
  * data again. Hashing is the repo's md5-parity discipline (first 4 hex
  * chars of md5("row:key"), mod width) so the DuckDB oracle replays the
  * exact sketch; a production swap to xxhash64(row, key) is one line.
  * Point lookups ([[estimate]]) probe depth buckets per key and take
  * the min.
  */
object CountMin {

  /** The shared row-hash: build and probe MUST agree bucket-for-bucket. */
  private def bucketOf(row: Column, key: Column, width: Int): Column =
    conv(substring(md5(concat(row.cast("string"), lit(":"), key)), 1, 4),
      16, 10).cast("long") % width

  /** Build the sketch over `keyCol`: (row, bucket, c), ≤ depth×width
    * rows regardless of input size. */
  def sketch(df: DataFrame, keyCol: Column, depth: Int = 4,
      width: Int = 1024): DataFrame = {
    require(depth >= 1 && width >= 2, "depth >= 1 and width >= 2")
    require(width <= 65536, "width above 16 bits needs a longer md5 prefix")
    // NULL keys excluded: concat/md5 null-propagate to a NULL bucket —
    // junk sketch state that estimate() can never match (null != null
    // in the join), silently breaking the est >= truth guarantee
    df.select(keyCol.cast("string").as("k"))
      .filter(col("k").isNotNull)
      .select(explode(sequence(lit(0), lit(depth - 1))).as("row"), col("k"))
      .select(col("row"), bucketOf(col("row"), col("k"), width).as("bucket"))
      .groupBy("row", "bucket").agg(count(lit(1)).as("c"))
  }

  /** Merge sketches built with identical (depth, width): counters add. */
  def merge(sketches: Seq[DataFrame]): DataFrame = {
    require(sketches.nonEmpty, "nothing to merge")
    sketches.reduce(_ unionByName _)
      .groupBy("row", "bucket").agg(sum("c").as("c"))
  }

  /** Join-size (inner-product) estimate from two sketches built with
    * identical (depth, width): |A ⋈_k B| = Σ_k fA(k)·fB(k), estimated
    * as min over rows of Σ_bucket cA·cB (Cormode & Muthukrishnan 2005
    * §4.2). Colliding keys only ADD phantom cross-products, so the
    * estimate is one-sided like the point query: est ≥ truth always,
    * est ≤ truth + εNᴀNᴃ with prob 1−δ. This is the 100 TB join
    * PRE-FLIGHT: both sides' sketches are ≤ depth×width rows built
    * with one counting shuffle each — the decision "will this join
    * explode?" costs two scans and no shuffle of the key domain.
    * Returns one row (est). Per-bucket products are DECIMAL(38,0) —
    * two 10⁹-count buckets already overflow a long. */
  def innerProduct(skA: DataFrame, skB: DataFrame): DataFrame = {
    val a = skA.select(col("row"), col("bucket"),
      col("c").cast("decimal(38,0)").as("ca"))
    val b = skB.select(col("row"), col("bucket"),
      col("c").cast("decimal(38,0)").as("cb"))
    // LEFT join from A's rows: a depth row whose buckets never overlap
    // B's is PROOF the true join size is 0 (every true joint key would
    // hash into a shared bucket on that row), so it must contribute
    // ip = 0 to the min — an inner join dropped it, inflating the
    // estimate and returning NULL for fully disjoint sketches. The
    // final coalesce covers empty sketches (empty input ⟹ size 0).
    a.join(b, Seq("row", "bucket"), "left")
      .groupBy("row").agg(sum(col("ca") *
        coalesce(col("cb"), lit(java.math.BigDecimal.ZERO))).as("ip"))
      .agg(coalesce(min(col("ip")), lit(java.math.BigDecimal.ZERO))
        .cast("decimal(38,0)").as("est"))
  }

  /** Point estimates for a keys frame: min over the depth probed
    * counters (0 for buckets never touched). The sketch side is tiny
    * (≤ depth×width) — broadcast it. */
  def estimate(sk: DataFrame, keys: DataFrame, keyName: String,
      depth: Int = 4, width: Int = 1024): DataFrame =
    keys.select(col(keyName).cast("string").as("k"))
      .filter(col("k").isNotNull) // the sketch() NULL discipline
      .select(col("k"), explode(sequence(lit(0), lit(depth - 1))).as("row"))
      .withColumn("bucket", bucketOf(col("row"), col("k"), width))
      .join(broadcast(sk), Seq("row", "bucket"), "left")
      .groupBy("k").agg(min(coalesce(col("c"), lit(0L))).as("est"))
}
