package graft.functions

import java.time.LocalDate

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** P6 time-of-day + day-window helpers, with DST-boundary coverage
  * (reference `date_utils.py:98-102`, `:158-205`).
  */
class DateFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def tod(utc: String): String =
    Seq(utc).toDF("ts")
      .select(DateFunctions.timeOfDayUtc(to_timestamp(col("ts"))).as("t"))
      .collect().head.getString(0)

  test("timeOfDay: plain CST day") {
    // reference doc example: 13:27:45.163Z == 07:27:45 Chicago (CST)
    assert(tod("2025-11-24T13:27:45.163Z") === "07:27:45")
  }

  test("timeOfDay across spring-forward (2025-03-09): 02:xx never occurs") {
    assert(tod("2025-03-09T07:30:00Z") === "01:30:00") // CST, UTC-6
    assert(tod("2025-03-09T08:30:00Z") === "03:30:00") // CDT, 02:30 skipped
  }

  test("timeOfDay across fall-back (2025-11-02): 01:30 occurs twice") {
    assert(tod("2025-11-02T06:30:00Z") === "01:30:00") // CDT, UTC-5
    assert(tod("2025-11-02T07:30:00Z") === "01:30:00") // CST, UTC-6
  }

  test("dayWindow is half-open and DST-aware (23h and 25h days)") {
    val (s1, e1) = DateFunctions.dayWindow(LocalDate.of(2025, 3, 9))
    assert((e1.getTime - s1.getTime) === 23L * 3600 * 1000) // spring-forward
    val (s2, e2) = DateFunctions.dayWindow(LocalDate.of(2025, 11, 2))
    assert((e2.getTime - s2.getTime) === 25L * 3600 * 1000) // fall-back
    val (s3, e3) = DateFunctions.dayWindow(LocalDate.of(2025, 7, 4))
    assert((e3.getTime - s3.getTime) === 24L * 3600 * 1000)
  }

  test("rfc3339DayBounds matches the reference's API window format") {
    // CDT in October: -05:00 (reference example '2025-10-01T00:00:00-05:00')
    assert(DateFunctions.rfc3339DayBounds(LocalDate.of(2025, 10, 1))._1
      === "2025-10-01T00:00:00-05:00")
    assert(DateFunctions.rfc3339DayBounds(LocalDate.of(2025, 10, 31))._2
      === "2025-10-31T23:59:59-05:00")
    // CST in December: -06:00
    assert(DateFunctions.rfc3339DayBounds(LocalDate.of(2025, 12, 15))._1
      === "2025-12-15T00:00:00-06:00")
  }
}
