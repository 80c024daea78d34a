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
  * Algorithm: the sort-based single pass. Over DISTINCT points ordered
  * (x asc, y desc), a point survives iff the running max of `y` over
  * strictly-preceding rows is below its own `y`:
  *   - any preceding q has q.x < p.x, or q.x = p.x with q.y > p.y
  *     (duplicates removed) — either way `q.y >= p.y` ⟹ q dominates p;
  *   - conversely a dominator, having smaller-or-equal x and
  *     greater-or-equal y (one strict), always sorts before p.
  * One distinct + one window — no O(n²) pair join. The window is a
  * single global ordering; at 100 TB run it as a range-partitioned
  * sort carrying the per-partition max-y prefix (the
  * [[SequentialIds]] two-phase pattern) — the frontier itself is
  * output-sized, never collected.
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
    val distinctPts = pts.select("x", "y").distinct()
    val w = Window.orderBy(col("x").asc, col("y").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val sky = distinctPts
      .withColumn("_maxy", max(col("y")).over(w))
      .filter(col("_maxy").isNull || col("_maxy") < col("y"))
      .drop("_maxy")
    // re-attach ids: every row carrying a frontier (x, y) is frontier
    pts.join(sky, Seq("x", "y"))
      .select(col("pid"), col("x"), col("y"))
  }
}
