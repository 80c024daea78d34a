package graft

import java.time.{LocalDate, ZoneId, ZonedDateTime}
import java.time.format.DateTimeFormatter

import org.apache.spark.sql.{DataFrame, Observation, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{SalesEtl, SalesSink}
import graft.sources.SquareOrders

/** Parameterized ETL driver — the Spark equivalent of the reference's
  * `app/scripts/monthly_etl.py` orchestration (`monthly_etl.py:206-321`):
  * resolve a date window (default: previous calendar month in
  * America/Chicago, `monthly_etl.py:52-63`), optionally filter to one
  * location (`:81-104`), optionally cap input in test mode (`:107-115`),
  * run extract→transform→load as ONE lazy Spark plan, and report summary
  * stats (`:268-305`).
  *
  * Usage:
  *   runMain graft.EtlPipeline --orders <jsonGlob> --locations <parquet|builtin>
  *     --out <dir> [--start yyyy-MM-dd] [--end yyyy-MM-dd]
  *     [--location-filter <square_id>] [--test-limit <n>]
  *
  * The reference's per-location sequential loop becomes a single
  * distributed plan: per-location isolation is per-task retry, the
  * "loop" is a partition dimension, and the driver never holds rows.
  */
object EtlPipeline {

  private val chicago = ZoneId.of("America/Chicago")

  /** P11: previous calendar month [first, last] in Chicago local time
    * (reference `date_utils.py:105-155`). */
  def previousMonthWindow(today: LocalDate = LocalDate.now(chicago)): (LocalDate, LocalDate) = {
    val firstOfThis = today.withDayOfMonth(1)
    val lastOfPrev = firstOfThis.minusDays(1)
    (lastOfPrev.withDayOfMonth(1), lastOfPrev)
  }

  /** F5: Chicago-local [start 00:00, end 24:00) window → UTC instants. */
  def utcWindow(start: LocalDate, end: LocalDate): (java.sql.Timestamp, java.sql.Timestamp) = {
    def utc(z: ZonedDateTime) = java.sql.Timestamp.from(z.toInstant)
    (utc(start.atStartOfDay(chicago)), utc(end.plusDays(1).atStartOfDay(chicago)))
  }

  private def parseArgs(args: Array[String]): Map[String, String] =
    args.sliding(2, 2).collect {
      case Array(k, v) if k.startsWith("--") => k.drop(2) -> v
    }.toMap

  def builtinLocations(spark: SparkSession): DataFrame = {
    import spark.implicits._
    // reference config.py:248 — 3 bakery locations
    Seq((1, "Wrigleyville", "LWRIG000000001"),
      (2, "Current", "L5WST6KFZBT10"),
      (3, "Southport", "LSOUT000000003"))
      .toDF("id", "name", "square_id")
  }

  /** Summary stats for one run (reference `monthly_etl.py:268-305`). */
  case class EtlStats(orders: Long, rejectedOrders: Long,
      unknownLocationRows: Long, quarantinedRows: Long, rowsWritten: Long)

  /** Extract→transform→load as ONE Spark action, stats included.
    *
    * All five summary counts are collected with `observe()` DURING the
    * single write pass — the previous shape (4 extra `count()` jobs plus
    * a re-read of the written output) scanned the source ~5×, which at
    * 100 TB is four wasted full passes. Rejected orders are observed
    * before the window filter, order counts after the window/cap, and
    * the unknown-location / quarantine / written split on the flagged
    * frame feeding the write — so every metric rides the write job.
    *
    * With `testLimit` set the upstream scan legitimately short-circuits,
    * so `rejectedOrders` then counts rejects among the rows actually
    * scanned for the capped sample (test mode only; the reference's test
    * mode caps its input the same way). */
  def runPipeline(located: DataFrame, locations: DataFrame,
      loTs: java.sql.Timestamp, hiTs: java.sql.Timestamp,
      outDir: String, testLimit: Option[Int] = None,
      auditDir: Option[String] = None): EtlStats = {
    val obsSrc = Observation("graft_src")
    val obsOrders = Observation("graft_orders")
    val obsRows = Observation("graft_rows")

    // order-level rejects observed BEFORE the window predicate would
    // silently drop null-timestamp orders
    val observed = located.observe(obsSrc,
      count(when(to_timestamp(col("closed_at")).isNull, 1)).as("rejected"))
    val windowed = observed.filter(
      to_timestamp(col("closed_at")) >= lit(loTs) &&
        to_timestamp(col("closed_at")) < lit(hiTs))
    val capped = testLimit.fold(windowed)(windowed.limit)
      .observe(obsOrders, count(lit(1)).as("orders"))

    val sales = SalesEtl.toSalesRows(capped)
    val flagged = SalesEtl.withLocationsFlagged(sales, locations)
      .withColumn("_valid", SalesEtl.isValidSalesRow)
      .observe(obsRows,
        count(when(!col("_known"), 1)).as("unknown"),
        count(when(col("_known") && !col("_valid"), 1)).as("quarantined"),
        count(when(col("_known") && col("_valid"), 1)).as("written"))
    val valid = flagged.filter(col("_known") && col("_valid"))
      .drop("_known", "_valid")
    SalesSink.writePartitioned(valid, outDir)

    // --audit <dir>: durable quarantine (reference logs-and-skips; at
    // scale the skipped rows must be inspectable, not just counted).
    // Deliberately extra jobs — only on explicit request.
    auditDir.foreach { dir =>
      SalesEtl.rejectedOrders(located).withColumn("reason", lit("no_closed_at"))
        .write.mode("append").json(s"$dir/rejected_orders")
      SalesEtl.unknownLocations(sales, locations)
        .withColumn("reason", lit("unknown_location"))
        .write.mode("append").json(s"$dir/unknown_locations")
      flagged.filter(col("_known") && !col("_valid")).drop("_known", "_valid")
        .withColumn("reason", lit("failed_validation"))
        .write.mode("append").json(s"$dir/quarantined_rows")
    }

    // a month with no qualifying rows can optimize sections of the plan
    // to an empty relation, and the CollectMetrics nodes vanish with
    // them — Observation then resolves to an EMPTY map. A scheduled run
    // over a quiet month must report zeros, not crash on a missing key
    // (found by the tools/monthly_etl.sh smoke over an out-of-range
    // window). Only the WHOLE-map-empty case is defaulted: a key
    // missing from a populated map is a rename/typo bug that must keep
    // crashing loudly, not report 0 rows written for a real month.
    def metric(m: Map[String, Any], key: String): Long =
      if (m.isEmpty) 0L else m(key).asInstanceOf[Long]
    EtlStats(
      orders = metric(obsOrders.get, "orders"),
      rejectedOrders = metric(obsSrc.get, "rejected"),
      unknownLocationRows = metric(obsRows.get, "unknown"),
      quarantinedRows = metric(obsRows.get, "quarantined"),
      rowsWritten = metric(obsRows.get, "written"))
  }

  def main(args: Array[String]): Unit = {
    val opts = parseArgs(args)
    val t0 = System.nanoTime()
    val spark = GraftSession.getOrCreate("graft-etl")

    val fmt = DateTimeFormatter.ISO_LOCAL_DATE
    val (defStart, defEnd) = previousMonthWindow()
    val start = opts.get("start").map(LocalDate.parse(_, fmt)).getOrElse(defStart)
    val end = opts.get("end").map(LocalDate.parse(_, fmt)).getOrElse(defEnd)
    require(!start.isAfter(end), s"start $start must be <= end $end")
    val (loTs, hiTs) = utcWindow(start, end)

    val locations = opts.get("locations").filter(_ != "builtin")
      .map(spark.read.parquet(_)).getOrElse(builtinLocations(spark))

    // --format square-orders: the DataSource V2 connector (per-location
    // partitions + filter/limit pushdown); default: plain schema'd JSON
    val raw = opts.get("format") match {
      case Some("square-orders") =>
        spark.read.format("square-orders").load(opts("orders"))
      case _ => SquareOrders.fromJsonFile(spark, opts("orders"))
    }
    // F7 location filter first (partition-prunable)
    val located = opts.get("location-filter")
      .fold(raw)(id => raw.filter(col("location_id") === id))

    val stats = runPipeline(located, locations, loTs, hiTs, opts("out"),
      opts.get("test-limit").map(_.toInt), opts.get("audit"))

    val secs = (System.nanoTime() - t0) / 1e9
    println(f"""{"window":"$start..$end","orders":${stats.orders},""" +
      f""""rejected_orders":${stats.rejectedOrders},""" +
      f""""unknown_location_rows":${stats.unknownLocationRows},""" +
      f""""quarantined_rows":${stats.quarantinedRows},""" +
      f""""rows_written":${stats.rowsWritten},"seconds":$secs%.2f}""")
    spark.stop()
  }
}
