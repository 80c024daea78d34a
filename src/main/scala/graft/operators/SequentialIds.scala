package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Contiguous global sequence numbers (0..n-1) in a total order —
  * the "give every training example a stable dense id" pipeline op —
  * WITHOUT the single-partition window that `row_number() OVER (ORDER
  * BY ...)` plans to (one task holding the whole corpus: the classic
  * scale-killer this operator exists to avoid; `monotonically_
  * increasing_id` is distributed but non-contiguous and
  * partition-layout-dependent, so it's no contract either).
  *
  * Shape: one range exchange (the same cost as any global sort) fixed
  * in place with a localCheckpoint, then a P-row per-partition count
  * whose prefix sum becomes each partition's id offset, then
  * offset + (local row_number within the partition). The driver holds
  * P longs, every partition numbers itself independently, and ids are
  * dense, deterministic, and equal to the rank in `order`.
  *
  * `order` must be a TOTAL order (append a unique key as the last sort
  * column) — equal sort keys would otherwise land nondeterministically
  * on either side of a partition boundary.
  */
object SequentialIds {

  def assign(df: DataFrame, order: Seq[Column],
      idName: String = "seq_id"): DataFrame = {
    require(order.nonEmpty, "a total order is required")
    val spark = df.sparkSession
    import spark.implicits._
    // pin the range-partition layout: the count pass and the numbering
    // pass MUST see identical boundaries, and re-planning the exchange
    // twice re-samples them
    val sorted = df
      .repartitionByRange(order: _*)
      .withColumn("_pid", spark_partition_id())
      .localCheckpoint()
    val counts = sorted.groupBy("_pid").agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val offsets = counts.map(_._1)
      .zip(counts.map(_._2).scanLeft(0L)(_ + _))
    val offDf = offsets.toSeq.toDF("_pid", "_off")
    val w = Window.partitionBy("_pid").orderBy(order: _*)
    sorted.join(broadcast(offDf), "_pid")
      .withColumn(idName, col("_off") + row_number().over(w) - 1)
      .drop("_pid", "_off")
  }
}
