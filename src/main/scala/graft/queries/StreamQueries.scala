package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.streaming.EventStreams

/** Batch-mode oracle queries for the streaming operators. The SAME
  * transform functions run under `readStream` in the specs; here they run
  * on the batch events table so DuckDB can check the arithmetic.
  */
object StreamQueries {

  private def events(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "events")

  // tumbling 1h window counts (EventStreams.windowedCounts)
  private def e01(s: SparkSession, dir: String): DataFrame =
    EventStreams.windowedCounts(events(s, dir))
      .orderBy("ws", "event_type")

  // 30-min-gap sessions (EventStreams.sessionCounts)
  private def e02(s: SparkSession, dir: String): DataFrame =
    EventStreams.sessionCounts(events(s, dir))
      .orderBy("user_id", "session_start")

  // per-user value delta via lag window function
  private def e03(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    events(s, dir)
      .select(col("event_id"),
        round(col("value") - lag("value", 1).over(w), 4).as("delta"))
      .orderBy("event_id")
      .limit(200)
  }

  // custom keyed state (flatMapGroupsWithState, fixed-point accumulator);
  // batch mode invokes each user's state function once, so the result is
  // a grouped count/sum the oracle can check — the same function runs
  // incrementally across triggers in EventStreamsSpec
  private def e04(s: SparkSession, dir: String): DataFrame =
    EventStreams.userStateTotals(events(s, dir)).orderBy("user_id")

  // stream-static enrichment (broadcast dim) + per-nation rollup; in
  // batch mode the same function is a plain broadcast join the oracle
  // reproduces directly
  private def e05(s: SparkSession, dir: String): DataFrame =
    EventStreams.enrichWithDim(events(s, dir),
      Tables(s, dir, "customer").select("c_custkey", "c_nationkey"),
      "user_id", "c_custkey")
      .groupBy("c_nationkey")
      .agg(count(lit(1)).as("cnt"),
        sum(col("value").cast("decimal(18,4)")).cast("double").as("total"))
      .orderBy("c_nationkey")

  // stream-stream interval join (clicks to preceding views of the same
  // user within 1h) — the SAME watermarked function the streaming spec
  // drives incrementally; in batch mode it degrades to the theta join
  // the oracle reproduces
  private def e06(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("event_id"), col("user_id"), col("ts").as("vts"))
    EventStreams.clickAfterViewJoin(clicks, views)
      .select(col("click_id"), col("view_id"), col("user_id"))
      .orderBy("click_id", "view_id").limit(500)
  }

  // streaming funnel state machine in batch mode: each user's history
  // arrives as one time-sorted group, so the emitted state equals the
  // relational strictly-after cascade — which is exactly what the
  // oracle recomputes (steps_completed = non-null cascade steps,
  // last_step_ts = the deepest completed step's time)
  private def e07(s: SparkSession, dir: String): DataFrame =
    EventStreams.funnelProgress(events(s, dir),
      Seq("signup", "view", "click", "purchase"))
      .select(col("user_id"), col("steps_completed"),
        // UTC wall-clock render → NTZ (the q10 discipline): naive in
        // parquet like the oracle's naive max(ts)
        col("last_step_ts").cast("timestamp_ntz").as("last_step_ts"))
      .orderBy("user_id")

  // stream-stream LEFT OUTER interval join in batch mode: views with
  // no qualifying click surface with a NULL click_id — the deferred
  // null emission the streaming spec drives through watermarks
  private def e08(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
    val views = ev.filter(col("event_type") === "view")
      .select(col("event_id"), col("user_id"), col("ts").as("vts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    EventStreams.viewClickLeftOuterJoin(views, clicks)
      .select(col("view_id"), col("click_id"), col("user_id"))
      .orderBy(col("view_id"), col("click_id").asc_nulls_first)
      .limit(500)
  }

  // stream-stream FULL OUTER interval join in batch mode: unmatched
  // views AND unmatched clicks both surface with a NULL partner — the
  // two-sided deferred null emission the streaming spec drives through
  // watermarks
  private def e09(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
    val views = ev.filter(col("event_type") === "view")
      .select(col("event_id"), col("user_id"), col("ts").as("vts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    EventStreams.viewClickFullOuterJoin(views, clicks)
      .select(col("view_id"), col("click_id"), col("user_id"))
      .orderBy(col("view_id").asc_nulls_first,
        col("click_id").asc_nulls_first)
      .limit(500)
  }

  // the graft-log connector (Kafka-shaped partitioned-log DSv2 source,
  // micro-batch + batch) read in batch mode over a committed fixture
  // log; the oracle recomputes each record's offset from the sequence
  // number embedded in its value, so the gate pins the reader's
  // partition/offset assignment, not just the payload
  private def e10(s: SparkSession, dir: String): DataFrame =
    s.read.format("graft-log").load(graft.GraftSession.fixture("graftlog"))
      .orderBy("partition", "offset")

  // tumbling-window distinct-user HLL sketch (the mergeable-sketch
  // family's streaming face, run here in batch mode): per-hour
  // registers -> per-window estimates via the SAME register arithmetic
  // as q45/q46, with the exact per-window distinct riding along. The
  // streaming spec drives the identical register function through a
  // MemoryStream and pins stream == batch.
  private def e13(s: SparkSession, dir: String): DataFrame = {
    val est = EventStreams.windowedDistinctUsers(events(s, dir))
    val exact = events(s, dir).filter(col("user_id").isNotNull)
      .groupBy(window(col("ts"), "1 hour").as("w"))
      .agg(countDistinct(col("user_id")).as("exact_distinct"))
      .select(col("w.start").as("ws"), col("exact_distinct"))
    est.join(exact, "ws")
      .select(col("ws"), col("m"), col("occupied"), col("est"),
        col("exact_distinct"))
      .orderBy("ws")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "e13_windowed_distinct" -> (e13 _),
    "e01_windowed_counts" -> (e01 _),
    "e02_session_counts" -> (e02 _),
    "e03_lag_delta" -> (e03 _),
    "e04_user_state" -> (e04 _),
    "e05_enrich_dim" -> (e05 _),
    "e06_interval_join" -> (e06 _),
    "e07_funnel_state" -> (e07 _),
    "e08_interval_left" -> (e08 _),
    "e09_interval_full" -> (e09 _),
    "e10_log_source" -> (e10 _),
    "e11_stream_dedup" -> (e11 _),
    "e12_trending_topk" -> (e12 _),
    "e14_rate_anomaly" -> (e14 _),
  )

  // trending top-3 event types per tumbling hour — the windowed-count
  // stream plus the foreachBatch rank layer, composed end-to-end in
  // batch so the oracle checks both stages
  private def e12(s: SparkSession, dir: String): DataFrame =
    EventStreams.trendingTopK(events(s, dir), k = 3)
      .orderBy("ws", "rank")

  // rate-anomaly over the hourly count stream (e12's two-stage shape):
  // trailing-median baseline per event type, spike = cnt > 2x median.
  // Composed end-to-end in batch for the oracle; the streaming spec
  // drives counts incrementally and applies the layer per microbatch
  private def e14(s: SparkSession, dir: String): DataFrame =
    EventStreams.anomalyWindows(
      EventStreams.windowedCounts(events(s, dir))
        .select("ws", "event_type", "cnt"))
      .orderBy("event_type", "ws")

  // bounded-state streaming dedup (dropDuplicatesWithinWatermark) in
  // batch mode: one kept row per (user_id, event_type), rolled up per
  // type so the output is key-determined (which row survives per key is
  // arbitrary in batch; the count is not). The watermark-eviction
  // semantics are two-trigger-spec'd in EventStreamsSpec.
  private def e11(s: SparkSession, dir: String): DataFrame =
    EventStreams.dedupWithinWatermark(events(s, dir),
      Seq("user_id", "event_type"), "ts", "1 hour")
      .groupBy("event_type").agg(count(lit(1)).as("unique_users"))
      .orderBy("event_type")

  val oracleSql: Map[String, String] = Map(
    // the q45 register pipeline replayed PER HOUR WINDOW: same 60-bit
    // md5 hash, same b=10 index/rank bit arithmetic, same
    // small-range-corrected estimate, exact distinct riding along
    "e13_windowed_distinct" ->
      ("WITH e AS (SELECT time_bucket(INTERVAL 1 HOUR, " +
        "CAST(ts AS TIMESTAMP)) AS ws, " +
        "CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)) " +
        "AS BIGINT) AS h, user_id FROM events " +
        "WHERE user_id IS NOT NULL), " +
        "r0 AS (SELECT ws, CAST(h % 1024 AS INT) AS j, " +
        "least(48, CASE WHEN h // 1024 = 0 THEN 51 " +
        "ELSE 51 - length(bin(h // 1024)) END) AS r FROM e), " +
        "reg AS (SELECT ws, j, max(r) AS r FROM r0 GROUP BY ws, j), " +
        "a AS (SELECT ws, count(*) AS occupied, CAST(coalesce(sum(" +
        "CAST(1 AS BIGINT) << CAST(48 - r AS INT)), 0) AS BIGINT) " +
        "AS socc FROM reg GROUP BY ws), " +
        "st AS (SELECT ws, occupied, socc + (1024 - occupied) * " +
        "(CAST(1 AS BIGINT) << 48) AS s, 1024 - occupied AS v FROM a), " +
        "est AS (SELECT ws, CAST(1024 AS BIGINT) AS m, " +
        "CAST(occupied AS BIGINT) AS occupied, " +
        "round(CASE WHEN (0.7213 / (1 + 1.079 / 1024)) * 1024 * 1024 * " +
        "pow(2, 48) / s <= 2.5 * 1024 AND v > 0 " +
        "THEN 1024 * ln(CAST(1024 AS DOUBLE) / v) " +
        "ELSE (0.7213 / (1 + 1.079 / 1024)) * 1024 * 1024 * " +
        "pow(2, 48) / s END, 2) AS est FROM st), " +
        "x AS (SELECT ws, CAST(count(DISTINCT user_id) AS BIGINT) " +
        "AS exact_distinct FROM e GROUP BY ws) " +
        "SELECT est.ws, m, occupied, est, exact_distinct " +
        "FROM est JOIN x USING (ws) ORDER BY ws"),
    "e12_trending_topk" ->
      ("WITH c AS (SELECT time_bucket(INTERVAL 1 HOUR, " +
        "CAST(ts AS TIMESTAMP)) AS ws, event_type, count(*) AS cnt " +
        "FROM events GROUP BY ws, event_type), " +
        "r AS (SELECT ws, event_type, cnt, CAST(row_number() OVER (" +
        "PARTITION BY ws ORDER BY cnt DESC, event_type) AS INTEGER) " +
        "AS rank FROM c) " +
        "SELECT ws, rank, event_type, cnt FROM r WHERE rank <= 3 " +
        "ORDER BY ws, rank"),
    "e01_windowed_counts" ->
      ("SELECT time_bucket(INTERVAL 1 HOUR, CAST(ts AS TIMESTAMP)) AS ws, " +
        "event_type, count(*) AS cnt, " +
        "CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total " +
        "FROM events GROUP BY ws, event_type ORDER BY ws, event_type"),
    // e01's hourly counts -> DuckDB median (same (n-1)q interpolation
    // as Spark's percentile, probe-checked) over the same ROWS frame
    // -> the shared spike predicate
    "e14_rate_anomaly" ->
      ("WITH e AS (SELECT time_bucket(INTERVAL 1 HOUR, " +
        "CAST(ts AS TIMESTAMP)) AS ws, event_type FROM events), " +
        "c AS (SELECT ws, event_type, CAST(count(*) AS BIGINT) AS cnt " +
        "FROM e GROUP BY 1, 2), " +
        "m AS (SELECT ws, event_type, cnt, median(cnt) OVER " +
        "(PARTITION BY event_type ORDER BY ws " +
        "ROWS BETWEEN 6 PRECEDING AND 1 PRECEDING) AS med FROM c) " +
        "SELECT ws, event_type, cnt, med, " +
        "coalesce(CAST(cnt AS DOUBLE) > 2 * med, false) AS spike " +
        "FROM m ORDER BY event_type, ws"),
    "e02_session_counts" ->
      ("WITH x AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS t FROM events), " +
        "m AS (SELECT user_id, t, CASE WHEN t - lag(t) OVER " +
        "(PARTITION BY user_id ORDER BY t) >= INTERVAL 30 MINUTE " +
        "THEN 1 ELSE 0 END AS brk FROM x), " +
        "s AS (SELECT user_id, t, sum(brk) OVER (PARTITION BY user_id " +
        "ORDER BY t ROWS UNBOUNDED PRECEDING) AS sid FROM m) " +
        "SELECT user_id, min(t) AS session_start, count(*) AS n_events " +
        "FROM s GROUP BY user_id, sid ORDER BY user_id, session_start"),
    "e03_lag_delta" ->
      ("SELECT event_id, round(value - lag(value) OVER " +
        "(PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id), 4) AS delta " +
        "FROM events ORDER BY event_id LIMIT 200"),
    "e04_user_state" ->
      ("SELECT user_id, count(*) AS events_seen, " +
        "CAST(sum(coalesce(CAST(round(value * 10000) AS BIGINT), 0)) " +
        "AS DOUBLE) / 10000.0 " +
        "AS total_value FROM events GROUP BY user_id ORDER BY user_id"),
    "e05_enrich_dim" ->
      ("SELECT c_nationkey, count(*) AS cnt, " +
        "CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total " +
        "FROM events e JOIN customer c ON e.user_id = c.c_custkey " +
        "GROUP BY c_nationkey ORDER BY c_nationkey"),
    "e06_interval_join" ->
      ("SELECT c.event_id AS click_id, v.event_id AS view_id, c.user_id " +
        "FROM events c JOIN events v ON c.user_id = v.user_id " +
        "AND c.event_type = 'click' AND v.event_type = 'view' " +
        "AND CAST(c.ts AS TIMESTAMP) >= CAST(v.ts AS TIMESTAMP) " +
        "AND CAST(c.ts AS TIMESTAMP) <= CAST(v.ts AS TIMESTAMP) + INTERVAL 1 HOUR " +
        "ORDER BY click_id, view_id LIMIT 500"),
    "e07_funnel_state" ->
      ("WITH e AS (SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS t " +
        "FROM events), " +
        "s0 AS (SELECT user_id, min(t) AS t0 FROM e " +
        "WHERE event_type = 'signup' GROUP BY user_id), " +
        "s1 AS (SELECT s0.user_id, t0, min(e.t) AS t1 FROM s0 LEFT JOIN e " +
        "ON e.user_id = s0.user_id AND e.event_type = 'view' AND e.t > s0.t0 " +
        "GROUP BY s0.user_id, t0), " +
        "s2 AS (SELECT s1.user_id, t0, t1, min(e.t) AS t2 FROM s1 LEFT JOIN e " +
        "ON e.user_id = s1.user_id AND e.event_type = 'click' AND e.t > s1.t1 " +
        "GROUP BY s1.user_id, t0, t1), " +
        "s3 AS (SELECT s2.user_id, t0, t1, t2, min(e.t) AS t3 FROM s2 LEFT JOIN e " +
        "ON e.user_id = s2.user_id AND e.event_type = 'purchase' AND e.t > s2.t2 " +
        "GROUP BY s2.user_id, t0, t1, t2) " +
        "SELECT user_id, CAST(CASE WHEN t1 IS NULL THEN 1 " +
        "WHEN t2 IS NULL THEN 2 WHEN t3 IS NULL THEN 3 ELSE 4 END " +
        "AS INTEGER) AS steps_completed, " +
        "coalesce(t3, t2, t1, t0) AS last_step_ts " +
        "FROM s3 ORDER BY user_id"),
    "e08_interval_left" ->
      ("SELECT v.event_id AS view_id, c.event_id AS click_id, v.user_id " +
        "FROM events v LEFT JOIN events c ON v.user_id = c.user_id " +
        "AND c.event_type = 'click' " +
        "AND CAST(c.ts AS TIMESTAMP) >= CAST(v.ts AS TIMESTAMP) " +
        "AND CAST(c.ts AS TIMESTAMP) <= CAST(v.ts AS TIMESTAMP) + INTERVAL 1 HOUR " +
        "WHERE v.event_type = 'view' " +
        "ORDER BY view_id, click_id NULLS FIRST LIMIT 500"),
    // full outer: both sides must be PRE-filtered subqueries (a WHERE
    // on the joined frame would discard the null-extended rows)
    "e09_interval_full" ->
      ("SELECT v.event_id AS view_id, c.event_id AS click_id, " +
        "coalesce(v.user_id, c.user_id) AS user_id " +
        "FROM (SELECT * FROM events WHERE event_type = 'view') v " +
        "FULL JOIN (SELECT * FROM events WHERE event_type = 'click') c " +
        "ON v.user_id = c.user_id " +
        "AND CAST(c.ts AS TIMESTAMP) >= CAST(v.ts AS TIMESTAMP) " +
        "AND CAST(c.ts AS TIMESTAMP) <= CAST(v.ts AS TIMESTAMP) + INTERVAL 1 HOUR " +
        "ORDER BY view_id NULLS FIRST, click_id NULLS FIRST LIMIT 500"),
    "e11_stream_dedup" ->
      ("SELECT event_type, count(DISTINCT user_id) AS unique_users " +
        "FROM events GROUP BY event_type ORDER BY event_type"),
    "e10_log_source" ->
      ("SELECT CAST(regexp_extract(filename, 'p(\\d+)/', 1) AS INT) " +
        "AS partition, " +
        "CAST(regexp_extract(value, '-(\\d+)$', 1) AS BIGINT) AS \"offset\", " +
        "CAST(\"timestamp\" AS BIGINT) AS \"timestamp\", \"key\", \"value\" " +
        "FROM read_json_auto('" + graft.GraftSession.fixture("graftlog") +
        "/*/*.jsonl', " +
        "filename=true) ORDER BY partition, \"offset\""),
  )
}
