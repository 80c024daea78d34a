package graft.operators

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing: assign documents to ~`budget`-token bins for
  * training-batch construction.
  *
  * Packing is sequential by nature (a bin is "full" relative to what
  * came before), which naïvely means a global ordered window — a
  * single-partition bottleneck at 100 TB. The scale shape: shard first
  * (deterministic hash of the id), pack WITHIN each shard with a
  * per-shard window — shards pack in parallel and each bin stays
  * inside one shard. Bin id = floor(preceding-cumulative-tokens /
  * budget) in id order: every bin's token sum is within one document
  * of `budget` (the standard streaming-fill approximation of bin
  * packing — exact, order-deterministic, and engine-portable, unlike
  * greedy best-fit which is neither parallel nor stable).
  */
object Packing {

  /** (shard, bin) assignment: docs in id order within `shards`
    * deterministic shards; a new bin starts when the running token
    * total crosses a `budget` multiple. The shard is an md5-prefix hash
    * of the id, not `id % shards`: structured id spaces (upstream
    * shards, snowflake ids with constant low bits) collapse a modulus
    * into one or two shards, which serializes packing through a single
    * window partition — the exact bottleneck sharding exists to avoid.
    * md5 keeps it engine-portable for the oracle. */
  def packByBudget(df: DataFrame, idCol: String, tokensCol: String,
      budget: Int, shards: Int): DataFrame = {
    require(budget > 0 && shards > 0, "budget and shards must be positive")
    val shard = DataSplit.hashBucket(col(idCol), shards).cast("int")
    val w = Window.partitionBy("shard").orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("shard", shard)
      .withColumn("bin",
        floor(coalesce(sum(col(tokensCol)).over(w), lit(0L)) / budget)
          .cast("long"))
  }

  /** Per-bin stats: how full did the bins get (packing quality). */
  def binStats(packed: DataFrame, tokensCol: String): DataFrame =
    packed.groupBy("shard", "bin")
      .agg(count(lit(1)).as("docs"), sum(col(tokensCol)).as("tokens"))
}
