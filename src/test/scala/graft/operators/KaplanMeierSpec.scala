package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

class KaplanMeierSpec extends SparkSpec {

  private def ev(rows: (Long, String, String)*) = {
    import spark.implicits._
    rows.map { case (u, ty, ts) => (u, ty, Timestamp.valueOf(ts)) }
      .toDF("user_id", "event_type", "ts")
  }

  // textbook check: 4 subjects, events at hours 1, 2, 2; one censored
  // survivor. S(1) = 3/4; S(2) = 3/4 * 1/3 = 1/4; censored row at
  // horizon carries S unchanged.
  test("hand-computed curve: risk sets, ties, censoring") {
    val events = ev(
      (1L, "signup", "2024-01-01 00:00:00"),
      (1L, "purchase", "2024-01-01 01:30:00"), // t=1
      (2L, "signup", "2024-01-01 00:00:00"),
      (2L, "purchase", "2024-01-01 02:10:00"), // t=2
      (3L, "signup", "2024-01-01 00:00:00"),
      (3L, "purchase", "2024-01-01 02:50:00"), // t=2 (tie)
      (4L, "signup", "2024-01-01 00:00:00")) // never converts -> censored
    val out = EventAnalytics.kaplanMeier(events, "user_id", "ts",
      "event_type", "signup", "purchase", horizonHours = 10L)
      .orderBy("t")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
      .toSeq
    assert(out === Seq(
      (1L, 4L, 1L, 0L, 0.75),
      (2L, 3L, 2L, 0L, 0.25),
      (10L, 1L, 0L, 1L, 0.25)))
  }

  test("event beyond the horizon counts as censored at the horizon") {
    val events = ev(
      (1L, "signup", "2024-01-01 00:00:00"),
      (1L, "purchase", "2024-01-05 00:00:00"), // t=96 > horizon 72
      (2L, "signup", "2024-01-01 00:00:00"),
      (2L, "purchase", "2024-01-01 05:00:00")) // t=5
    val out = EventAnalytics.kaplanMeier(events, "user_id", "ts",
      "event_type", "signup", "purchase", horizonHours = 72L)
      .orderBy("t")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
      .toSeq
    assert(out === Seq((5L, 2L, 1L, 0L, 0.5), (72L, 1L, 0L, 1L, 0.5)))
  }

  test("terminal riskset with d = n renders survival 0.0, no NaN/Inf") {
    val events = ev(
      (1L, "signup", "2024-01-01 00:00:00"),
      (1L, "purchase", "2024-01-01 01:10:00"),
      (2L, "signup", "2024-01-01 00:00:00"),
      (2L, "purchase", "2024-01-01 01:40:00"))
    val out = EventAnalytics.kaplanMeier(events, "user_id", "ts",
      "event_type", "signup", "purchase", horizonHours = 72L)
      .collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getLong(2) === 2L && r.getLong(1) === 2L) // d = n = 2
    assert(r.getDouble(4) === 0.0)
  }

  test("pre-signup purchases are ignored for enrollment timing") {
    val events = ev(
      (1L, "purchase", "2023-12-25 00:00:00"), // before signup: ignored
      (1L, "signup", "2024-01-01 00:00:00"),
      (1L, "purchase", "2024-01-01 03:30:00"), // t=3 is the real event
      (2L, "signup", "2024-01-01 00:00:00"))
    val out = EventAnalytics.kaplanMeier(events, "user_id", "ts",
      "event_type", "signup", "purchase", horizonHours = 8L)
      .orderBy("t")
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSeq
    assert(out === Seq((3L, 1L), (8L, 0L)))
  }
}
