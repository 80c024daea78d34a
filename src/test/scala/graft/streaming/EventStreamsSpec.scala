package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

/** Streaming specs: the same transforms run (a) incrementally under
  * MemoryStream with watermarks and (b) in batch, and must agree. */
class EventStreamsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Int): Timestamp =
    Timestamp.valueOf(f"2025-01-01 ${10 + min / 60}%02d:${min % 60}%02d:00")

  private val rows = Seq(
    // (event_id, ts, user_id, event_type, value)
    (1L, ts(0), 1L, "view", 1.0),
    (2L, ts(5), 1L, "click", 2.0),
    (3L, ts(65), 1L, "view", 3.0), // next hour, and >30min gap => new session
    (4L, ts(10), 2L, "view", 4.0),
    (5L, ts(150), 2L, "view", 5.0))

  private def eventsDf = rows
    .toDF("event_id", "ts", "user_id", "event_type", "value")

  test("windowedCounts: incremental stream result == batch result") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val streamDf = mem.toDF()
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val q = EventStreams.windowedCounts(streamDf)
      .writeStream.format("memory").queryName("wc")
      .outputMode(OutputMode.Complete).start()
    try {
      mem.addData(rows.take(3).map(r => (r._1, r._2, r._3, r._4, r._5)))
      q.processAllAvailable()
      mem.addData(rows.drop(3).map(r => (r._1, r._2, r._3, r._4, r._5)))
      q.processAllAvailable()
      val streamed = spark.table("wc")
        .orderBy("ws", "event_type").collect().map(_.toSeq).toSeq
      val batch = EventStreams.windowedCounts(eventsDf)
        .orderBy("ws", "event_type").collect().map(_.toSeq).toSeq
      assert(streamed === batch)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("windowedUserRegisters: incremental stream registers == batch " +
    "(the HLL sketch's streaming face), and the estimate reads off") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val streamDf = mem.toDF()
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    // complete mode so late-window state is still visible in the sink;
    // production uses append + watermark eviction (same aggregation)
    val q = EventStreams.windowedUserRegisters(streamDf, b = 6)
      .writeStream.format("memory").queryName("wur")
      .outputMode(OutputMode.Complete).start()
    try {
      mem.addData(rows.take(3).map(r => (r._1, r._2, r._3, r._4, r._5)))
      q.processAllAvailable()
      mem.addData(rows.drop(3).map(r => (r._1, r._2, r._3, r._4, r._5)))
      q.processAllAvailable()
      val streamed = spark.table("wur")
        .orderBy("ws", "j").collect().map(_.toSeq).toSeq
      val batch = EventStreams.windowedUserRegisters(eventsDf, b = 6)
        .orderBy("ws", "j").collect().map(_.toSeq).toSeq
      assert(streamed === batch)
      assert(streamed.nonEmpty)
      // the stateless read-off over the streamed registers matches the
      // batch composition end-to-end — and in the exact-below-m regime
      // the estimate IS the distinct count per window
      val est = graft.operators.HyperLogLog.estimateBy(
          spark.table("wur").withColumnRenamed("ws", "shard"), b = 6)
        .orderBy("shard").collect().map(_.toSeq).toSeq
      val batchEst = EventStreams.windowedDistinctUsers(eventsDf, b = 6)
        .orderBy("ws").collect().map(_.toSeq).toSeq
      assert(est === batchEst)
    } finally q.stop()
  }

  test("trendingTopK: foreachBatch rank over upserted counts == batch") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val streamDf = mem.toDF()
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    // streaming half: update-mode windowed counts upserting a keyed
    // store; rank layer applied per microbatch over the full store
    val store = scala.collection.mutable.Map.empty[(Timestamp, String), Long]
    val q = EventStreams.windowedCounts(streamDf)
      .select("ws", "event_type", "cnt")
      .writeStream.outputMode(OutputMode.Update)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.collect().foreach { r =>
          store((r.getTimestamp(0), r.getString(1))) = r.getLong(2)
        }
      }
      .start()
    try {
      mem.addData(rows.take(3).map(r => (r._1, r._2, r._3, r._4, r._5)))
      q.processAllAvailable()
      mem.addData(rows.drop(3).map(r => (r._1, r._2, r._3, r._4, r._5)))
      q.processAllAvailable()
      val counts = store.toSeq
        .map { case ((ws, et), c) => (ws, et, c) }
        .toDF("ws", "event_type", "cnt")
      val streamed = EventStreams.rankWindows(counts, 2)
        .orderBy("ws", "rank").collect().map(_.toSeq).toSeq
      val batch = EventStreams.trendingTopK(eventsDf, 2)
        .orderBy("ws", "rank").collect().map(_.toSeq).toSeq
      assert(streamed === batch)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("anomalyWindows: foreachBatch layer over upserted counts == batch") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val streamDf = mem.toDF()
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val store = scala.collection.mutable.Map.empty[(Timestamp, String), Long]
    val q = EventStreams.windowedCounts(streamDf)
      .select("ws", "event_type", "cnt")
      .writeStream.outputMode(OutputMode.Update)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.collect().foreach { r =>
          store((r.getTimestamp(0), r.getString(1))) = r.getLong(2)
        }
      }
      .start()
    try {
      mem.addData(rows.take(3).map(r => (r._1, r._2, r._3, r._4, r._5)))
      q.processAllAvailable()
      mem.addData(rows.drop(3).map(r => (r._1, r._2, r._3, r._4, r._5)))
      q.processAllAvailable()
      val counts = store.toSeq
        .map { case ((ws, et), c) => (ws, et, c) }
        .toDF("ws", "event_type", "cnt")
      val streamed = EventStreams.anomalyWindows(counts)
        .orderBy("event_type", "ws").collect().map(_.toSeq).toSeq
      val batch = EventStreams.anomalyWindows(
          EventStreams.windowedCounts(eventsDf)
            .select("ws", "event_type", "cnt"))
        .orderBy("event_type", "ws").collect().map(_.toSeq).toSeq
      assert(streamed === batch)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("anomalyWindows: spike fires on >mult x trailing median, NULL-safe head") {
    // one type, counts 10,10,12,10,30: medians null,10,10,10.5(?),11
    // -- hand trace: window of previous up-to-6 rows
    val base = Timestamp.valueOf("2025-01-01 00:00:00")
    def hour(h: Int) = new Timestamp(base.getTime + h * 3600L * 1000)
    val counts = Seq(
      (hour(0), "click", 10L), (hour(1), "click", 10L),
      (hour(2), "click", 12L), (hour(3), "click", 10L),
      (hour(4), "click", 30L)).toDF("ws", "event_type", "cnt")
    val got = EventStreams.anomalyWindows(counts)
      .orderBy("ws").collect()
      .map(r => (if (r.isNullAt(3)) -1.0 else r.getDouble(3),
        r.getBoolean(4))).toSeq
    // medians of previous rows: [], [10], [10,10], [10,10,12],
    // [10,10,12,10] -> -1(null), 10, 10, 10, 10; spike only at 30 > 20
    assert(got === Seq((-1.0, false), (10.0, false), (10.0, false),
      (10.0, false), (10.0, true)))
  }

  test("enrichWithDim: stream-static broadcast join == batch join") {
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((1L, 10L), (2L, 20L)).toDF("c_custkey", "c_nationkey")
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val streamDf = mem.toDF()
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val q = EventStreams.enrichWithDim(streamDf, dim, "user_id", "c_custkey")
      .select("event_id", "c_nationkey")
      .writeStream.format("memory").queryName("en")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(rows.take(2))
      q.processAllAvailable()
      mem.addData(rows.drop(2))
      q.processAllAvailable()
      val streamed = spark.table("en")
        .orderBy("event_id").collect().map(_.toSeq).toSeq
      val batch = EventStreams
        .enrichWithDim(eventsDf, dim, "user_id", "c_custkey")
        .select("event_id", "c_nationkey")
        .orderBy("event_id").collect().map(_.toSeq).toSeq
      assert(streamed === batch)
      assert(streamed.size === rows.size) // every user resolves
    } finally q.stop()
  }

  test("sessionCounts: 30-min gap splits sessions (batch mode)") {
    val out = EventStreams.sessionCounts(eventsDf)
      .orderBy("user_id", "session_start")
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    // user 1: events at 0,5 then 65 => sessions of 2 and 1
    // user 2: events at 10 then 150 => sessions of 1 and 1
    assert(out.toSeq === Seq((1L, 2L), (1L, 1L), (2L, 1L), (2L, 1L)))
  }

  test("stream-stream interval join: incremental == batch theta join") {
    implicit val sqlCtx = spark.sqlContext
    val cMem = MemoryStream[(Long, Timestamp, Long)]
    val vMem = MemoryStream[(Long, Timestamp, Long)]
    val cDf = cMem.toDF().toDF("event_id", "ts", "user_id")
    val vDf = vMem.toDF().toDF("event_id", "vts", "user_id")
    val q = EventStreams.clickAfterViewJoin(cDf, vDf)
      .writeStream.format("memory").queryName("ssj")
      .outputMode(OutputMode.Append).start()
    try {
      vMem.addData((100L, ts(0), 1L), (101L, ts(10), 2L))
      cMem.addData((200L, ts(30), 1L)) // within 1h of view 100
      q.processAllAvailable()
      cMem.addData((201L, ts(95), 2L)) // 85min after view 101 -> no match
      cMem.addData((202L, ts(40), 2L)) // 30min after view 101 -> match
      q.processAllAvailable()
      val got = spark.table("ssj")
        .select("click_id", "view_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === Set((200L, 100L), (202L, 101L)))
      // batch equivalence through the same function
      val cB = Seq((200L, ts(30), 1L), (201L, ts(95), 2L), (202L, ts(40), 2L))
        .toDF("event_id", "ts", "user_id")
      val vB = Seq((100L, ts(0), 1L), (101L, ts(10), 2L))
        .toDF("event_id", "vts", "user_id")
      val batch = EventStreams.clickAfterViewJoin(cB, vB)
        .select("click_id", "view_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(batch === got)
    } finally q.stop()
  }

  test("streamingDedup drops cross-trigger duplicates within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, String)]
    val stream = mem.toDF().toDF("doc_id", "ts", "text")
    val q = EventStreams.streamingDedup(stream, "ts")
      .writeStream.format("memory").queryName("dd")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData((1L, ts(0), "the quick brown fox"), (2L, ts(1), "other doc"))
      q.processAllAvailable()
      // duplicate of doc 1 (case/whitespace variant) in a later trigger
      mem.addData((3L, ts(2), "THE  Quick brown fox"), (4L, ts(3), "fresh doc"))
      q.processAllAvailable()
      val kept = spark.table("dd").select("doc_id").as[Long].collect().sorted
      assert(kept.toSeq === Seq(1L, 2L, 4L)) // 3 deduped against state
    } finally q.stop()
  }

  test("dedupWithinWatermark: dups dropped inside the window, key state " +
    "evicted once the watermark passes, late re-arrival re-emitted") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Long, String)]
    val stream = mem.toDF().toDF("event_id", "ts", "user_id", "event_type")
    val q = EventStreams.dedupWithinWatermark(stream,
      Seq("user_id", "event_type"), "ts", "10 minutes")
      .writeStream.format("memory").queryName("ddw")
      .outputMode(OutputMode.Append).start()
    def minutes(m: Int) = new Timestamp(ts(0).getTime + m * 60000L)
    try {
      // trigger 1: key (7,click) + an in-trigger duplicate -> one row
      mem.addData((1L, minutes(0), 7L, "click"), (2L, minutes(1), 7L, "click"))
      q.processAllAvailable()
      // trigger 2: watermark advances to 00:30 - 10m = 00:20, expiring
      // (7,click)'s state (kept until its ts + delay = 00:10)
      mem.addData((3L, minutes(30), 9L, "view"))
      q.processAllAvailable()
      // trigger 3: same key re-arrives at 00:25 (> watermark, admitted;
      // state gone) -> re-emitted: the documented at-least-once contract
      mem.addData((4L, minutes(25), 7L, "click"))
      q.processAllAvailable()
      val got = spark.table("ddw").select("event_id").as[Long]
        .collect().sorted
      assert(got.toSeq === Seq(1L, 3L, 4L))
    } finally q.stop()
  }

  test("runningUserTotals: custom keyed state accumulates across triggers") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Double)]
    val q = EventStreams.runningUserTotals(mem.toDS())
      .writeStream.format("memory").queryName("rt")
      .outputMode(OutputMode.Update).start()
    try {
      mem.addData((1L, 1.0), (1L, 2.0), (2L, 10.0))
      q.processAllAvailable()
      mem.addData((1L, 4.0))
      q.processAllAvailable()
      // last update per user reflects all data seen across both triggers
      val last = spark.table("rt")
        .groupBy("user_id")
        .agg(max(struct(col("events_seen"), col("total_value"))).as("s"))
        .select(col("user_id"), col("s.events_seen"), col("s.total_value"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(last === Set((1L, 3L, 7.0), (2L, 1L, 10.0)))
    } finally q.stop()
  }

  test("runningUserTotalsExpiring: idle state expires with a flagged " +
    "final emit and is actually removed") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Double)]
    // ProcessingTimeTimeout makes Spark schedule batches continuously
    // (it cannot know whether timers remain) — an unpaced trigger then
    // churns thousands of no-data micro-batches and wedges the
    // checkpoint manager. Pace it; poll the sink instead of racing.
    val q = EventStreams.runningUserTotalsExpiring(mem.toDS(),
      idleTimeout = "1 second")
      .writeStream.format("memory").queryName("rte")
      .trigger(org.apache.spark.sql.streaming.Trigger
        .ProcessingTime("500 milliseconds"))
      .outputMode(OutputMode.Update).start()
    def rows() = spark.table("rte").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))
    def awaitRow(want: (Long, Long, Double, Boolean)): Unit = {
      val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
      while (!rows().contains(want) && System.nanoTime() < deadline)
        Thread.sleep(100)
      assert(rows().contains(want),
        s"expected $want in sink, got ${rows().toSeq}")
    }
    // processAllAvailable is also off the table here: under
    // ProcessingTimeTimeout the engine keeps running timer batches and
    // the no-new-data signal never settles — poll the sink only.
    try {
      mem.addData((1L, 1.0), (1L, 2.0))
      awaitRow((1L, 2L, 3.0, false))
      // the idle deadline passes; a later (possibly no-data) batch
      // fires user 1's timer: one final emit flagged expired=true
      awaitRow((1L, 2L, 3.0, true))
      // user 1 returns: totals restart from zero => state was removed,
      // not merely flagged
      mem.addData((1L, 5.0))
      awaitRow((1L, 1L, 5.0, false))
    } finally q.stop()
  }

  test("userStateTotals: incremental last-update per user == batch result") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Double)]
    val streamDf = mem.toDF().toDF("user_id", "value")
    val q = EventStreams.userStateTotals(streamDf)
      .writeStream.format("memory").queryName("ust")
      .outputMode(OutputMode.Update).start()
    try {
      mem.addData((1L, 1.0001), (1L, 2.5), (2L, 10.0))
      q.processAllAvailable()
      mem.addData((1L, 4.25), (2L, 0.0001))
      q.processAllAvailable()
      val last = spark.table("ust")
        .groupBy("user_id")
        .agg(max(struct(col("events_seen"), col("total_value"))).as("s"))
        .select(col("user_id"), col("s.events_seen"), col("s.total_value"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val batch = EventStreams.userStateTotals(
        Seq((1L, 1.0001), (1L, 2.5), (2L, 10.0), (1L, 4.25), (2L, 0.0001))
          .toDF("user_id", "value"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(last === batch)
      assert(last === Set((1L, 3L, 7.7501), (2L, 2L, 10.0001)))
    } finally q.stop()
  }

  test("viewClickLeftOuterJoin: matches emit promptly, null rows only " +
      "after the watermark proves no match can arrive") {
    implicit val sqlCtx = spark.sqlContext
    val vMem = MemoryStream[(Long, Long, Timestamp)]
    val cMem = MemoryStream[(Long, Long, Timestamp)]
    val views = vMem.toDF().toDF("event_id", "user_id", "vts")
    val clicks = cMem.toDF().toDF("event_id", "user_id", "ts")
    val q = EventStreams.viewClickLeftOuterJoin(views, clicks,
        window = "1 hour", delay = "10 minutes")
      .writeStream.format("memory").queryName("vclo")
      .outputMode(OutputMode.Append).start()
    try {
      // u1 view with a click 5 min later; u2 view with NO click ever
      vMem.addData((1L, 1L, ts(0)), (2L, 2L, ts(1)))
      cMem.addData((10L, 1L, ts(5)))
      q.processAllAvailable()
      val early = spark.table("vclo")
        .collect().map(r => (r.getLong(0), Option(r.get(1)))).toSet
      assert(early.contains((1L, Some(10L))))
      assert(!early.exists(_._1 == 2L),
        "outer null must NOT emit while a match could still arrive")
      // advance both watermarks far past view@ts(1) + 1h + 10min
      vMem.addData((99L, 9L, ts(300)))
      cMem.addData((98L, 9L, ts(300)))
      q.processAllAvailable()
      val late = spark.table("vclo")
        .collect().map(r => (r.getLong(0), Option(r.get(1)))).toSet
      assert(late.contains((2L, None)),
        s"watermark passed: u2's null row must emit, got $late")
    } finally q.stop()
  }

  test("viewClickFullOuterJoin: null rows emit on BOTH sides once " +
      "watermarks prove no match can arrive") {
    implicit val sqlCtx = spark.sqlContext
    val vMem = MemoryStream[(Long, Long, Timestamp)]
    val cMem = MemoryStream[(Long, Long, Timestamp)]
    val views = vMem.toDF().toDF("event_id", "user_id", "vts")
    val clicks = cMem.toDF().toDF("event_id", "user_id", "ts")
    val q = EventStreams.viewClickFullOuterJoin(views, clicks,
        window = "1 hour", delay = "10 minutes")
      .writeStream.format("memory").queryName("vcfo")
      .outputMode(OutputMode.Append).start()
    try {
      // u1: view + click (match); u2: view, NO click ever;
      // u3: click, NO view ever (the side left-outer can't cover)
      vMem.addData((1L, 1L, ts(0)), (2L, 2L, ts(1)))
      cMem.addData((10L, 1L, ts(5)), (30L, 3L, ts(2)))
      q.processAllAvailable()
      val early = spark.table("vcfo").collect()
        .map(r => (Option(r.get(0)), Option(r.get(1)))).toSet
      assert(early.contains((Some(1L), Some(10L))))
      assert(!early.exists(p => p._1.contains(2L) || p._2.contains(30L)),
        "no outer null may emit while a match could still arrive")
      // advance both watermarks far past every window + delay
      vMem.addData((99L, 9L, ts(300)))
      cMem.addData((98L, 9L, ts(300)))
      q.processAllAvailable()
      val late = spark.table("vcfo").collect()
        .map(r => (Option(r.get(0)), Option(r.get(1)))).toSet
      assert(late.contains((Some(2L), None)),
        s"unmatched view must emit with null click, got $late")
      assert(late.contains((None, Some(30L))),
        s"unmatched click must emit with null view, got $late")
    } finally q.stop()
  }

  test("viewClickFullOuterJoin: batch mode equals the SQL full outer") {
    val views = Seq((1L, 1L, ts(0)), (2L, 2L, ts(1)))
      .toDF("event_id", "user_id", "vts")
    val clicks = Seq((10L, 1L, ts(5)), (30L, 3L, ts(2)),
        (11L, 1L, ts(90))) // 90min after u1's view: outside the window
      .toDF("event_id", "user_id", "ts")
    val got = EventStreams.viewClickFullOuterJoin(views, clicks)
      .select("view_id", "click_id", "user_id").collect()
      .map(r => (Option(r.get(0)), Option(r.get(1)), r.getLong(2))).toSet
    assert(got === Set(
      (Some(1L), Some(10L), 1L),  // in-window match
      (Some(2L), None, 2L),       // view with no click
      (None, Some(30L), 3L),      // click with no view
      (None, Some(11L), 1L)))     // click outside its view's window
  }

  test("funnelProgress: incremental == batch == the relational cascade") {
    implicit val sqlCtx = spark.sqlContext
    val steps = Seq("view", "click", "purchase")
    // u1 completes in order across two triggers; u2's click precedes its
    // view (same trigger, out-of-order INSIDE the batch — the buffered
    // sort must handle it); u3 never views
    val funnelRows = Seq(
      (1L, ts(0), 1L, "view", 0.0),
      (2L, ts(5), 1L, "click", 0.0),
      (10L, ts(3), 2L, "click", 0.0),
      (11L, ts(2), 2L, "view", 0.0), // view@2 < click@3: click counts
      (20L, ts(1), 3L, "purchase", 0.0),
      // trigger 2
      (3L, ts(30), 1L, "purchase", 0.0),
      (12L, ts(40), 2L, "purchase", 0.0)) // purchase without click-after-view? click@3 counted, so full funnel
    val asTuples = funnelRows.map(r => (r._1, r._2, r._3, r._4, r._5))
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val streamDf = mem.toDF()
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val q = EventStreams.funnelProgress(streamDf, steps)
      .writeStream.format("memory").queryName("fp")
      .outputMode(OutputMode.Update).start()
    try {
      mem.addData(asTuples.take(5))
      q.processAllAvailable()
      mem.addData(asTuples.drop(5))
      q.processAllAvailable()
      val last = spark.table("fp")
        .groupBy("user_id")
        .agg(max(struct(col("steps_completed"), col("last_step_ts"))).as("s"))
        .select(col("user_id"), col("s.steps_completed"))
        .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
      val batchDf = funnelRows
        .toDF("event_id", "ts", "user_id", "event_type", "value")
      val batch = EventStreams.funnelProgress(batchDf, steps)
        .collect().map(r => (r.user_id, r.steps_completed)).toSet
      assert(last === batch)
      assert(last === Set((1L, 3), (2L, 3)))
      // agreement with the relational batch cascade: steps completed ==
      // count of non-null step_ts columns per user
      val cascade = graft.operators.EventAnalytics
        .funnelUserSteps(batchDf, "user_id", "event_type", "ts", steps)
        .collect()
        .map(r => (r.getLong(0), (1 to 3).count(i => !r.isNullAt(i))))
        .toSet
      assert(cascade === last)
    } finally q.stop()
  }

  test("userStateTotals: NULL values count as events and add 0") {
    val df = Seq((1L, Some(2.5)), (1L, None), (2L, None))
      .toDF("user_id", "value")
    val out = EventStreams.userStateTotals(df)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(out === Set((1L, 2L, 2.5), (2L, 1L, 0.0)))
  }
}
