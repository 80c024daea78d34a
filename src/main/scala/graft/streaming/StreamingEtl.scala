package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.{SalesEtl, SalesSink}
import graft.sources.SquareOrders

/** Continuous ingestion of the sales dataflow: the SAME `SalesEtl`
  * transform that runs in batch, under Structured Streaming.
  *
  * The whole pipeline is stateless (explode/filter/project/broadcast
  * join), so it runs in append mode with no watermark state; each
  * micro-batch lands in the (location_id, month)-partitioned table via
  * foreachBatch → `SalesSink.writePartitioned`. Exactly-once comes from
  * the checkpoint + the sink's idempotent partition layout.
  *
  * The reference's "incremental" mode is a monthly cron batch
  * (`monthly_etl.yml:4-6`); this is the upgrade path to minutes-level
  * latency without a second codebase.
  */
object StreamingEtl {

  /** Watch `ordersDir` for new order-JSON files, write sales rows to
    * `outDir`, checkpoint at `checkpointDir`. */
  def start(spark: SparkSession, ordersDir: String, locations: DataFrame,
      outDir: String, checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val orders = spark.readStream
      .schema(SquareOrders.orderSchema)
      .json(ordersDir)
    val sales = SalesEtl.validate(
      SalesEtl.withLocations(SalesEtl.toSalesRows(orders), locations))._1
    sales.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        SalesSink.writePartitioned(batch, outDir)
      }
      .start()
  }

  /** CLI: runMain graft.streaming.StreamingEtl <ordersDir> <outDir>
    * <checkpointDir> — processes all available order files then exits
    * (AvailableNow); re-running resumes from the checkpoint. */
  def main(args: Array[String]): Unit = {
    val Array(ordersDir, outDir, ckpt) = args.take(3)
    val spark = graft.GraftSession.getOrCreate("graft-streaming-etl")
    val q = start(spark, ordersDir,
      graft.EtlPipeline.builtinLocations(spark), outDir, ckpt)
    q.awaitTermination()
    val n = spark.read.parquet(outDir).count()
    println(s"""{"stream":"complete","rows_in_table":$n}""")
    spark.stop()
  }
}
