package graft

import java.time.{LocalDate, ZoneId, ZonedDateTime}
import java.time.format.DateTimeFormatter

import org.apache.spark.sql.{DataFrame, SparkSession}
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
    // F7 location filter first (partition-prunable), then order-level
    // rejects counted BEFORE the window predicate would silently drop
    // null-timestamp orders, then S2/F5 window + S3 test limit.
    val located = opts.get("location-filter")
      .fold(raw)(id => raw.filter(col("location_id") === id))
    val nRejected = SalesEtl.rejectedOrders(located).count()
    val windowed = located.filter(
      to_timestamp(col("closed_at")) >= lit(loTs) &&
        to_timestamp(col("closed_at")) < lit(hiTs))
    val capped = opts.get("test-limit")
      .fold(windowed)(n => windowed.limit(n.toInt))

    val sales = SalesEtl.toSalesRows(capped)
    val resolved = SalesEtl.withLocations(sales, locations)
    val (valid, quarantined) = SalesEtl.validate(resolved)

    val outDir = opts("out")
    SalesSink.writePartitioned(valid, outDir)

    // --audit <dir>: durable quarantine (reference logs-and-skips; at
    // scale the skipped rows must be inspectable, not just counted)
    opts.get("audit").foreach { auditDir =>
      SalesEtl.rejectedOrders(located).withColumn("reason", lit("no_closed_at"))
        .write.mode("append").json(s"$auditDir/rejected_orders")
      SalesEtl.unknownLocations(sales, locations)
        .withColumn("reason", lit("unknown_location"))
        .write.mode("append").json(s"$auditDir/unknown_locations")
      quarantined.withColumn("reason", lit("failed_validation"))
        .write.mode("append").json(s"$auditDir/quarantined_rows")
    }

    // summary stats (reference monthly_etl.py:268-305)
    val nOrders = capped.count()
    val nUnknownLoc = SalesEtl.unknownLocations(sales, locations).count()
    val nQuarantined = quarantined.count()
    val written = spark.read.parquet(outDir).count()
    val secs = (System.nanoTime() - t0) / 1e9
    println(f"""{"window":"$start..$end","orders":$nOrders,""" +
      f""""rejected_orders":$nRejected,"unknown_location_rows":$nUnknownLoc,""" +
      f""""quarantined_rows":$nQuarantined,"rows_written":$written,""" +
      f""""seconds":$secs%.2f}""")
    spark.stop()
  }
}
