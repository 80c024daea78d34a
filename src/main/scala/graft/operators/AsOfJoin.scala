package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — for each left row, the most recent right
  * row with right.ts <= left.ts per key. The op a feature pipeline needs
  * for leakage-free training joins; Spark has no built-in.
  *
  * Per the preference order (compose built-ins before custom plans):
  * implemented as union → one window pass per key (`last(..., ignoreNulls)`
  * over a time-ordered frame) → filter back to left rows. Cost = ONE
  * shuffle on the key + one sort per partition — the same price as the
  * sort-merge join a native implementation would do, with Catalyst
  * handling spill/AQE. No per-row lookups, no broadcast of the right
  * side, skew handled like any windowed op (salt the key upstream if one
  * key dominates).
  *
  * Ties: a right row at exactly left.ts IS visible (inclusive, matching
  * DuckDB `ASOF JOIN ... ON l.ts >= r.ts` — right rows sort before left
  * rows at equal timestamps).
  */
object AsOfJoin {

  /** Backward as-of left join.
    *
    * @param keys      equi-join key columns (present on both sides)
    * @param leftTs    left timestamp column name
    * @param rightTs   right timestamp column name
    * @param rightVals right value columns to carry to matched left rows
    * @param prefix    prefix for the matched columns in the output
    *                  (`<prefix>ts` + one `<prefix><col>` per value col)
    * @return left rows + matched right columns (null when no prior row)
    */
  def backward(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, rightVals: Seq[String],
      prefix: String = "asof_"): DataFrame = {
    val lCols = left.columns.toSeq
    val outRight = s"${prefix}ts" +: rightVals.map(c => s"$prefix$c")
    require(
      lCols.intersect(outRight ++ Seq("_ts", "_side", "_asof")).isEmpty,
      s"left columns collide with output/internal columns " +
        s"$outRight, _ts, _side, _asof")

    // ALL matched columns travel in ONE struct, so last(..., ignoreNulls)
    // is row-atomic: per-column lasts would skip a legitimate NULL in
    // one right value column and resurrect the value from an OLDER
    // right row — a frankenstein match mixing two rows (and silently
    // substituting stale feature values for real NULLs)
    val asofType = org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types
        .StructField(s"${prefix}ts", right.schema(rightTs).dataType) +:
        rightVals.map(c => org.apache.spark.sql.types
          .StructField(s"$prefix$c", right.schema(c).dataType)))

    val lTagged = left
      .withColumn("_ts", col(leftTs))
      .withColumn("_side", lit(1))
      .withColumn("_asof", lit(null).cast(asofType))

    val rTagged = right
      .select((keys.map(col) ++
        Seq(col(rightTs).as("_ts"), lit(0).as("_side"),
          struct(col(rightTs).as(s"${prefix}ts") +:
            rightVals.map(c => col(c).as(s"$prefix$c")): _*).as("_asof")) ++
        lCols.filterNot(keys.contains).map(c =>
          lit(null).cast(left.schema(c).dataType).as(c))): _*)
      .select(lTagged.columns.map(col): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_ts").asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matched = last(col("_asof"), ignoreNulls = true).over(w)
    lTagged.unionByName(rTagged)
      .select((lCols.map(col) :+ col("_side")) ++
        outRight.map(c => matched.getField(c).as(c)): _*)
      .filter(col("_side") === 1)
      .drop("_side")
  }
}
