package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D skyline / Pareto frontier (Börzsönyi, Kossmann & Stocker 2001,
  * "The Skyline Operator"): the points no other point dominates —
  * lower `x` AND higher `y` with at least one strict. The
  * cost-vs-volume question every procurement or quality-vs-size
  * curation tradeoff asks.
  *
  * Algorithm: the sort-based single pass, DISTRIBUTED. Over DISTINCT
  * points ordered (x asc, y desc), a point survives iff the running
  * max of `y` over strictly-preceding rows is below its own `y`:
  *   - any preceding q has q.x < p.x, or q.x = p.x with q.y > p.y
  *     (duplicates removed) — either way `q.y >= p.y` ⟹ q dominates p;
  *   - conversely a dominator, having smaller-or-equal x and
  *     greater-or-equal y (one strict), always sorts before p.
  * The global ordering is a RANGE exchange (`row_number OVER (ORDER
  * BY)`'s single-task window shape is exactly what this operator must
  * not plan): each partition computes its local running max, the
  * driver folds the P per-partition maxima into a prefix (P longs —
  * the [[SequentialIds]] two-phase pattern), and a broadcast join
  * hands each partition the max-y of everything before it. No O(n²)
  * pair join, no one-task sort; the frontier is output-sized, never
  * collected.
  *
  * Inputs are exact types (DECIMAL / BIGINT), so dominance — and the
  * frontier — replays bit-for-bit in any engine.
  */
object Skyline {

  /** Frontier of (xCol minimized, yCol maximized) over distinct
    * (id, x, y) rows — id kept for reporting, dominance judged on the
    * distinct (x, y) point set. */
  def frontier(points: DataFrame, id: String, xCol: String,
      yCol: String): DataFrame = {
    val pts = points.select(col(id).as("pid"), col(xCol).as("x"),
      col(yCol).as("y"))
    val order = Seq(col("x").asc, col("y").desc)
    // pin the range layout: the per-partition max pass and the filter
    // pass must see identical boundaries (the SequentialIds discipline)
    val sorted = pts.select("x", "y").distinct()
      .repartitionByRange(order: _*)
      .withColumn("_pid", spark_partition_id())
      .localCheckpoint(true)
    // each partition's max y, folded into the max over all STRICTLY-
    // PRECEDING partitions (null for the first). The unpartitioned
    // window here is P = partition-count rows — constant-sized by
    // construction, never data-sized — and keeps y's type generic
    // (no driver-side decode of DECIMAL/BIGINT)
    val preW = Window.orderBy("_pid")
      .rowsBetween(Window.unboundedPreceding, -1)
    val preDf = sorted.groupBy("_pid")
      .agg(max(col("y")).as("_pm"))
      .withColumn("_pre", max(col("_pm")).over(preW))
      .select("_pid", "_pre")
    val w = Window.partitionBy("_pid").orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    // greatest() ignores nulls, so the first partition (null prefix)
    // and each partition's first row (null local max) fall through to
    // the other operand — null only when BOTH are (global first row)
    val sky = sorted
      .withColumn("_maxy", max(col("y")).over(w))
      .join(broadcast(preDf), "_pid")
      .withColumn("_dom", greatest(col("_maxy"), col("_pre")))
      .filter(col("_dom").isNull || col("_dom") < col("y"))
      .select("x", "y")
    // re-attach ids: every row carrying a frontier (x, y) is frontier
    pts.join(sky, Seq("x", "y"))
      .select(col("pid"), col("x"), col("y"))
  }
}
