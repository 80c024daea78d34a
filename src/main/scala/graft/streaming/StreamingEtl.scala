package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.SalesEtl
import graft.sources.SquareOrders

/** Continuous ingestion of the sales dataflow: the SAME `SalesEtl`
  * transform that runs in batch, under Structured Streaming.
  *
  * The whole pipeline is stateless (explode/filter/project/broadcast
  * join), so it runs in append mode with no watermark state. Each
  * micro-batch OVERWRITES its own batchId-scoped directory
  * (`out/batch=<id>/location_id=…/month=…`): a batch that fails after
  * writing but before the checkpoint commit is replayed with the SAME
  * batchId and replaces its directory instead of appending duplicates —
  * that per-batchId idempotence plus the checkpoint's exactly-once
  * batchId assignment is what makes the sink end-to-end exactly-once
  * (a blind append here would only be at-least-once). Readers see
  * `batch` as an extra leading partition column; location/month pruning
  * still applies, and a periodic compaction can fold batch dirs into
  * the plain (location_id, month) layout.
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
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        writeBatch(batch, outDir, batchId)
      }
      .start()
  }

  /** Idempotent micro-batch landing: overwrite THIS batch's directory
    * only. Replaying the same batchId (post-failure re-run) replaces
    * rather than appends — the property that upgrades the sink from
    * at-least-once to exactly-once. */
  def writeBatch(batch: DataFrame, outDir: String, batchId: Long): Unit =
    batch.write.mode(SaveMode.Overwrite)
      .partitionBy("location_id", "month")
      .parquet(s"$outDir/batch=$batchId")

  /** Manifest-committed micro-batch landing — the snapshot-isolated
    * upgrade of [[writeBatch]]: each batch's files land invisible and
    * become readable with ONE manifest rename, so a reader NEVER sees a
    * half-written batch (the batchId-dir sink exposes in-progress files
    * to anyone scanning `outDir` without the batch column discipline).
    * Exactly-once comes from the txn tag instead of dir overwrite: a
    * batch replayed after a post-commit crash finds its own batchId on
    * the current manifest and no-ops (streaming batchIds are monotonic
    * and only the latest uncommitted batch replays — the transactional-
    * sink argument; orphan files from a pre-commit crash stay invisible
    * and are [[graft.operators.ManifestTable.vacuum]]ed). Compaction
    * needs no maintenance window here — `ManifestTable.compact` is one
    * more commit, and maintenance commits CARRY the txn tag forward,
    * so a compact interleaved with a crash-replay window cannot erase
    * the idempotence marker and readmit the batch (pinned by
    * ManifestTableSpec's carry-forward test). */
  def writeBatchManifest(batch: DataFrame, tableDir: String,
      batchId: Long, files: Int = 1): Long = {
    import graft.operators.ManifestTable
    val spark = batch.sparkSession
    val txn = Some(s"batch-$batchId")
    val (v, _) = ManifestTable.currentManifest(spark, tableDir)
    if (v == 0L) ManifestTable.create(spark, tableDir, batch, files,
      txn = txn)
    else ManifestTable.append(spark, tableDir, batch, files, txn = txn)
  }

  /** Streaming MERGE — the CDC/late-data upgrade of
    * [[writeBatchManifest]]: each micro-batch UPSERTS by `keyCol`
    * instead of appending, so a corrected record (a revised order, a
    * re-scored document) REPLACES its earlier rows rather than
    * duplicating them — the foreachBatch-merge pattern every
    * table-format streaming sink converges on. Exactly-once is the same
    * txn-tag argument: a replayed batchId finds its tag on the current
    * manifest (maintenance carries it forward) and no-ops; keys only in
    * earlier batches are untouched — file-level copy-on-write keeps the
    * rewrite proportional to the keys the batch actually touches, not
    * the table. First batch creates the table (stats on `keyCol` so
    * later merges prune exactly). */
  def writeBatchUpsert(batch: DataFrame, tableDir: String,
      batchId: Long, keyCol: String, files: Int = 1): Long = {
    import graft.operators.ManifestTable
    val spark = batch.sparkSession
    val txn = Some(s"batch-$batchId")
    val (v, _) = ManifestTable.currentManifest(spark, tableDir)
    if (v == 0L) ManifestTable.create(spark, tableDir, batch, files,
      statsCols = Seq(keyCol), txn = txn)
    else ManifestTable.upsert(spark, tableDir, keyCol, batch, files,
      statsCols = Seq(keyCol), txn = txn)
  }

  /** [[start]] with the manifest-committed sink: same transform, but
    * downstream readers go through `ManifestTable.read(tableDir)` and
    * see only whole committed batches. */
  def startManifest(spark: SparkSession, ordersDir: String,
      locations: DataFrame, tableDir: String, checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val orders = spark.readStream
      .schema(SquareOrders.orderSchema)
      .json(ordersDir)
    val sales = SalesEtl.validate(
      SalesEtl.withLocations(SalesEtl.toSalesRows(orders), locations))._1
    sales.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        writeBatchManifest(batch, tableDir, batchId); ()
      }
      .start()
  }

  /** Compaction: fold the streaming table's batchId-scoped directories
    * into the batch table's plain (location_id, month) layout at
    * `destDir` (full overwrite — rerunnable, no partial-state risk; the
    * streaming source dirs are left untouched). Run periodically so
    * downstream readers see the canonical layout and small per-batch
    * files get coalesced. */
  def compactStream(spark: SparkSession, streamDir: String,
      destDir: String): Unit =
    spark.read.parquet(streamDir)
      .drop("batch")
      .write.mode(SaveMode.Overwrite)
      .partitionBy("location_id", "month")
      .parquet(destDir)

  /** CLI: runMain graft.streaming.StreamingEtl <ordersDir> <outDir>
    * <checkpointDir> — processes all available order files then exits
    * (AvailableNow); re-running resumes from the checkpoint. */
  def main(args: Array[String]): Unit = {
    if (args.length < 3) {
      System.err.println(
        "usage: StreamingEtl <ordersDir> <outDir> <checkpointDir>")
      sys.exit(2)
    }
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
