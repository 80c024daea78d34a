package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Sinks for the sales fact table.
  *
  * The reference bulk-loads into a Postgres table LIST-partitioned by
  * `location_id`, with secondary indexes on month/timestamp/item_name and
  * a guarded per-(location, month) DELETE for backfills
  * (`database_service.py:214-338`, `:415-475`, `README.md:131-141`).
  *
  * Spark-native layout: parquet partitioned by (location_id, month).
  * LIST-partition parity comes from the location dirs; the month index
  * becomes month partition pruning; and the backfill delete becomes a
  * partition-directory drop — O(1) metadata work instead of a table
  * rewrite, which is what makes backfill viable on a 100 TB table.
  * (A plain dynamic-overwrite delete silently no-ops when the surviving
  * slice is empty — an empty DataFrame overwrites no partitions — so the
  * delete is done at the partition layer, not the row layer.)
  */
object SalesSink {

  /** Partitioned append: location dirs (LIST parity) × month dirs
    * (index parity → pruning). */
  def writePartitioned(sales: DataFrame, path: String,
      mode: SaveMode = SaveMode.Append): Unit =
    sales.write.mode(mode).partitionBy("location_id", "month").parquet(path)

  /** S7 backfill: drop the (location_id, month) slice — a partition
    * directory delete — then append the replacement, if any. */
  def overwriteMonth(spark: SparkSession, path: String, locationId: Int,
      month: String, replacement: Option[DataFrame] = None): Unit = {
    val slice = new Path(s"$path/location_id=$locationId/month=$month")
    val fs = slice.getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(slice, true)
    replacement.foreach(writePartitioned(_, path, SaveMode.Append))
  }

  /** Bucketed managed table: rows hash-bucketed (and sorted) by the join
    * key so repeated joins/aggregations on that key skip the shuffle
    * entirely — the Spark analogue of co-located storage. Joining two
    * tables bucketed the same way produces a SortMergeJoin with NO
    * Exchange on either side (spec-enforced). This is the layout for the
    * 100 TB fact⋈fact case where neither side broadcasts. */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
      buckets: Int, mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode)
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)

  /** JDBC sink shape (reference S6). Batching via the `batchsize` option;
    * task-level retry is Spark-native. Not exercised in tests (no DB in
    * the sandbox) but this is the full production call. */
  def writeJdbc(sales: DataFrame, url: String, table: String,
      props: java.util.Properties, batchSize: Int = 100): Unit =
    sales.write.mode(SaveMode.Append)
      .option("batchsize", batchSize.toString)
      .jdbc(url, table, props)
}
