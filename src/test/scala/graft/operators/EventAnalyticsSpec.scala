package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class EventAnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  // (event_id, user, type, ts)
  private lazy val events = Seq(
    // u1 completes the full funnel in order
    (1L, 1L, "view", ts("2024-01-01 10:00:00")),
    (2L, 1L, "click", ts("2024-01-01 10:05:00")),
    (3L, 1L, "purchase", ts("2024-01-01 10:10:00")),
    // u2: click BEFORE first view must not count; no purchase
    (4L, 2L, "click", ts("2024-01-02 09:00:00")),
    (5L, 2L, "view", ts("2024-01-02 10:00:00")),
    (6L, 2L, "click", ts("2024-01-02 11:00:00")),
    // u3: view only
    (7L, 3L, "view", ts("2024-01-03 08:00:00")),
    // u4: never views — excluded from the funnel entirely
    (8L, 4L, "purchase", ts("2024-01-01 08:00:00"))
  ).toDF("event_id", "user_id", "event_type", "ts")

  test("sessionize: gap boundary is strict, ties break by id, per-user") {
    val e = Seq(
      // u1: three events, gaps 30min / exactly 1h (inclusive) -> one session
      (1L, 1L, "view", ts("2024-01-01 10:00:00")),
      (2L, 1L, "view", ts("2024-01-01 10:30:00")),
      (3L, 1L, "view", ts("2024-01-01 11:30:00")),
      // gap 1h + 1s (strictly over) -> new session
      (4L, 1L, "view", ts("2024-01-01 12:30:01")),
      // u2: two events at the SAME ts -> one session, and the tie-break
      // keeps the lag well-defined
      (5L, 2L, "view", ts("2024-01-01 09:00:00")),
      (6L, 2L, "view", ts("2024-01-01 09:00:00"))
    ).toDF("event_id", "user_id", "event_type", "ts")
    val out = EventAnalytics.sessionize(e, "user_id", "ts", "event_id",
        gapSeconds = 3600)
      .orderBy("user_id", "session_num")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2),
        r.getTimestamp(3), r.getLong(4)))
    assert(out.toSeq === Seq(
      (1L, 1L, ts("2024-01-01 10:00:00"), ts("2024-01-01 11:30:00"), 3L),
      (1L, 2L, ts("2024-01-01 12:30:01"), ts("2024-01-01 12:30:01"), 1L),
      (2L, 1L, ts("2024-01-01 09:00:00"), ts("2024-01-01 09:00:00"), 2L)))
  }

  test("funnelCounts: ordered completion, pre-step events don't count") {
    val rows = EventAnalytics.funnelCounts(events, "user_id", "event_type",
        "ts", Seq("view", "click", "purchase"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(rows.toSeq === Seq((0, "view", 3L), (1, "click", 2L),
      (2, "purchase", 1L)))
  }

  test("funnelCounts: step names with quotes and backslashes stay intact") {
    val tricky = Seq("don't", """back\slash""", "a''b")
    val e = Seq((1L, "don't", ts("2024-01-01 10:00:00")),
      (1L, """back\slash""", ts("2024-01-01 10:01:00")),
      (1L, "a''b", ts("2024-01-01 10:02:00")))
      .toDF("user_id", "event_type", "ts")
    val rows = EventAnalytics.funnelCounts(e, "user_id", "event_type",
        "ts", tricky)
      .collect().map(r => (r.getString(1), r.getLong(2)))
    assert(rows.toSeq === tricky.map(_ -> 1L))
  }

  test("funnelUserSteps: abandoned funnel leaves later steps null") {
    val m = EventAnalytics.funnelUserSteps(events, "user_id", "event_type",
        "ts", Seq("view", "click", "purchase"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(m(1L).getTimestamp(3) === ts("2024-01-01 10:10:00"))
    assert(m(2L).getTimestamp(2) === ts("2024-01-02 11:00:00"))
    assert(m(2L).isNullAt(3)) // u2 never purchases
    assert(m(3L).isNullAt(2)) // u3 never clicks
    assert(m(3L).isNullAt(3)) // ts > null stays null downstream
    assert(!m.contains(4L))   // never entered the funnel
  }

  test("cohortRetention: day offsets from per-user first activity") {
    val rows = EventAnalytics.cohortRetention(events, "user_id", "ts")
      .orderBy("cohort_date", "day_offset")
      .collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2)))
    // u1+u4 cohort 01-01 (2 users day 0); u2 cohort 01-02; u3 cohort 01-03
    assert(rows.toSeq === Seq(
      ("2024-01-01", 0L, 2L), ("2024-01-02", 0L, 1L), ("2024-01-03", 0L, 1L)))
  }

  test("firstLastEvent: tie-broken entry/exit per user") {
    val m = EventAnalytics.firstLastEvent(events, "user_id", "event_type",
        "ts", "event_id")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getString(2)))
      .toMap
    assert(m(1L) === ("view", "purchase"))
    assert(m(2L) === ("click", "click"))
    assert(m(3L) === ("view", "view"))
    assert(m(4L) === ("purchase", "purchase"))
  }

  test("gapFillDailyCounts: empty days appear zero-filled") {
    val rows = EventAnalytics.gapFillDailyCounts(events, "event_type", "ts")
      .orderBy("event_type", "d").collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2)))
    // span 01-01..01-03: every type × every day present, zeros included
    assert(rows.length === 3 * 3) // 3 types × 3 days
    val m = rows.map { case (t, d, c) => (t, d) -> c }.toMap
    assert(m(("purchase", "2024-01-01")) === 2L)
    assert(m(("purchase", "2024-01-02")) === 0L) // gap, zero-filled
    assert(m(("view", "2024-01-03")) === 1L)
    assert(m(("click", "2024-01-03")) === 0L)
  }

  test("funnel and retention tolerate an empty event log") {
    val empty = events.filter(lit(false))
    assert(EventAnalytics.funnelCounts(empty, "user_id", "event_type",
      "ts", Seq("view", "click")).collect()
      .map(r => r.getLong(2)).toSeq === Seq(0L, 0L))
    assert(EventAnalytics.cohortRetention(empty, "user_id", "ts")
      .count() === 0L)
    assert(EventAnalytics.gapFillDailyCounts(empty, "event_type", "ts")
      .count() === 0L) // null min/max -> empty sequence, not a crash
  }

  test("attribution: first/last touch in window, nulls outside it") {
    val e = Seq(
      // u1: view@0, click@30, purchase@60 — both touches in 1h window
      (1L, 1L, "view", ts("2024-01-01 10:00:00")),
      (2L, 1L, "click", ts("2024-01-01 10:30:00")),
      (3L, 1L, "purchase", ts("2024-01-01 11:00:00")),
      // u2: touch 3h before purchase — OUTSIDE the window → nulls
      (10L, 2L, "view", ts("2024-01-01 07:00:00")),
      (11L, 2L, "purchase", ts("2024-01-01 10:00:00")),
      // u3: two touches at the SAME instant — tie broken by event_id
      (20L, 3L, "view", ts("2024-01-01 09:00:00")),
      (21L, 3L, "click", ts("2024-01-01 09:00:00")),
      (22L, 3L, "purchase", ts("2024-01-01 09:30:00"))
    ).toDF("event_id", "user_id", "event_type", "ts")
    val got = EventAnalytics.attribution(e, "event_id", "user_id",
        "event_type", "ts", "purchase", Seq("view", "click"), "1 hour")
      .collect().map(r => r.getLong(0) ->
        ((Option(r.get(2)), Option(r.get(4)), r.getLong(6)))).toMap
    assert(got(3L) === ((Some(2L), Some(1L), 2L)))  // last=click, first=view
    assert(got(11L) === ((None, None, 0L)))          // stale touch → null
    assert(got(22L) === ((Some(21L), Some(20L), 2L))) // id tie-break
  }

  test("firstLastEvent: equal timestamps fall back to the tie column") {
    val e = Seq(
      (10L, 9L, "a", ts("2024-01-01 00:00:00")),
      (11L, 9L, "b", ts("2024-01-01 00:00:00"))
    ).toDF("event_id", "user_id", "event_type", "ts")
    val r = EventAnalytics.firstLastEvent(e, "user_id", "event_type",
      "ts", "event_id").collect()
    assert(r.length === 1)
    assert((r(0).getString(1), r(0).getString(2)) === ("a", "b"))
  }

  test("gapFillDailyCounts drops NULL event types instead of zeroing them") {
    // r7 review fix: a NULL type entered the dims via distinct() but
    // never matched the equi-join, so its real counts rendered as an
    // all-zero series
    import java.sql.Timestamp
    val e = Seq(
      (1L, "a", Timestamp.valueOf("2024-01-01 00:00:00")),
      (2L, null: String, Timestamp.valueOf("2024-01-01 00:00:00")))
      .toDF("event_id", "event_type", "ts")
    val rows = EventAnalytics.gapFillDailyCounts(e, "event_type", "ts")
      .collect().map(r => (r.getString(0), r.getLong(2)))
    assert(rows.toSeq === Seq(("a", 1L))) // no NULL series at all
  }
}
