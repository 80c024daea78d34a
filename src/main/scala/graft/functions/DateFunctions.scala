package graft.functions

import java.time.{LocalDate, LocalTime, ZoneId, ZonedDateTime}
import java.time.format.DateTimeFormatter

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Date/time derivations of the reference's `date_utils.py`, as
  * codegen'd column expressions (the per-row parts) and driver-side
  * window helpers (the orchestration parts).
  */
object DateFunctions {

  val chicagoTz = "America/Chicago"
  private val chicago = ZoneId.of(chicagoTz)

  /** P6 (reference `date_utils.py:98-102`): time-of-day of a local
    * wall-clock timestamp as 'HH:mm:ss' — the intraday (hourly sales
    * pattern) axis. Pure projection, stays in WholeStageCodegen. */
  def timeOfDay(localTs: Column): Column = date_format(localTs, "HH:mm:ss")

  /** P6 from a UTC instant: convert to the analysis timezone's wall
    * clock, then extract. */
  def timeOfDayUtc(instant: Column, tz: String = chicagoTz): Column =
    timeOfDay(from_utc_timestamp(instant, tz))

  /** Single-day window [d 00:00, d+1 00:00) in Chicago local time as UTC
    * instants (reference `date_utils.py:158-205` day-range shape —
    * half-open, so DST-short/long days still partition cleanly). */
  def dayWindow(day: LocalDate): (java.sql.Timestamp, java.sql.Timestamp) = {
    def utc(z: ZonedDateTime) = java.sql.Timestamp.from(z.toInstant)
    (utc(day.atStartOfDay(chicago)), utc(day.plusDays(1).atStartOfDay(chicago)))
  }

  /** RFC3339 day bounds with the Chicago offset, exactly as the
    * reference formats API query windows (`square_service.py:106-135`,
    * `date_utils.py` format_for_square_api): start 'T00:00:00-0X:00',
    * end 'T23:59:59-0X:00' — offset follows DST. */
  def rfc3339DayBounds(day: LocalDate): (String, String) = {
    val fmt = DateTimeFormatter.ISO_OFFSET_DATE_TIME
    (ZonedDateTime.of(day, LocalTime.MIDNIGHT, chicago).format(fmt),
      ZonedDateTime.of(day, LocalTime.of(23, 59, 59), chicago).format(fmt))
  }
}
