package graft

import org.apache.spark.sql.SparkSession

import graft.operators.SalesSink

/** S7 backfill CLI — Spark equivalent of the reference's guarded
  * partitioned delete (`database_service.py:415-475`): remove one
  * (location_id, month) slice from the sales table, optionally loading a
  * replacement, via dynamic partition overwrite (only the affected
  * location partition is rewritten).
  *
  * Usage: runMain graft.Backfill <tablePath> <locationId> <month>
  *          [replacementParquet] [--confirm]
  *
  * Without --confirm it only counts matching rows (the reference's
  * count-first guard) and makes no change.
  */
object Backfill {
  def main(args: Array[String]): Unit = {
    val positional = args.filterNot(_ == "--confirm")
    val confirm = args.contains("--confirm")
    require(positional.length >= 3,
      "usage: Backfill <tablePath> <locationId> <month 'yyyy-MM'> [replacementParquet] [--confirm]")
    val Array(path, locStr, month) = positional.take(3)
    val locationId = locStr.toInt
    require(month.matches("""\d{4}-\d{2}"""), s"month must be yyyy-MM, got: $month")

    val spark = GraftSession.getOrCreate("graft-backfill")
    import org.apache.spark.sql.functions.col

    val matching = spark.read.parquet(path)
      .filter(col("location_id") === locationId && col("month") === month)
      .count()
    if (!confirm) {
      println(s"""{"action":"dry-run","matching_rows":$matching,"hint":"pass --confirm to delete"}""")
    } else {
      val replacement = positional.lift(3).map(spark.read.parquet(_))
      SalesSink.overwriteMonth(spark, path, locationId, month, replacement)
      val after = spark.read.parquet(path)
        .filter(col("location_id") === locationId && col("month") === month)
        .count()
      println(s"""{"action":"overwrite","deleted_rows":$matching,"rows_now_in_slice":$after}""")
    }
    spark.stop()
  }
}
