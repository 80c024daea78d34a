package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-log analytics: ordered funnels and cohort retention.
  *
  * North-star extensions of the reference's BI consumption surface
  * (`README.md:274-289` documents the schema being designed for
  * time-bucketed rollups over the fact table); funnels and retention are
  * the canonical next questions an analyst asks of the same event-shaped
  * data, so the engine provides them as first-class operators.
  *
  * Scale shape (100 TB event log):
  *  - [[funnelUserSteps]] never materializes the raw log per user: each
  *    step is a filtered scan (predicate pushdown prunes to one event
  *    type) aggregated to ONE row per user before the next join, so every
  *    shuffle after the first carries user-count rows, not event-count
  *    rows. Steps chain left joins on the user key — AQE coalesces and
  *    the per-user frame stays tiny.
  *  - [[cohortRetention]] is two user-keyed shuffles (first-seen agg +
  *    join back) followed by a (cohort, offset)-keyed count-distinct; the
  *    distinct expands to (cohort, offset, user) which is exactly the
  *    active-user fact — no wider than the input.
  */
object EventAnalytics {

  /** Per-user completion timestamps for an ordered step sequence.
    *
    * Row per user who completed step 0; column `step_ts_i` is the
    * earliest time the user completed step i STRICTLY AFTER completing
    * step i-1 (null once the funnel is abandoned — subsequent steps stay
    * null because `ts > null` never matches).
    */
  def funnelUserSteps(events: DataFrame, user: String, typeCol: String,
      ts: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "at least one funnel step required")
    val first = events.filter(col(typeCol) === steps.head)
      .groupBy(col(user))
      .agg(min(col(ts)).as("step_ts_0"))
    steps.zipWithIndex.drop(1).foldLeft(first) { case (acc, (step, i)) =>
      val cand = events.filter(col(typeCol) === step)
        .select(col(user).as("_cand_user"), col(ts).as("_cand_ts"))
      val carried = (0 until i).map(j => min(col(s"step_ts_$j")).as(s"step_ts_$j"))
      acc.join(cand,
          acc(user) === col("_cand_user") &&
            col("_cand_ts") > col(s"step_ts_${i - 1}"),
          "left")
        .groupBy(col(user))
        .agg(carried.head, carried.tail :+ min(col("_cand_ts")).as(s"step_ts_$i"): _*)
    }
  }

  /** Funnel conversion counts: one row per step with the number of users
    * who reached it in order. `users` is monotonically non-increasing. */
  def funnelCounts(events: DataFrame, user: String, typeCol: String,
      ts: String, steps: Seq[String]): DataFrame = {
    val perUser = funnelUserSteps(events, user, typeCol, ts, steps)
    val counts = perUser.agg(
      count(col("step_ts_0")).as("c0"),
      steps.indices.drop(1).map(i => count(col(s"step_ts_$i")).as(s"c$i")): _*)
    // Column-API unpivot: string-SQL stack() would need step-name
    // escaping (and Spark's adjacent-literal concat makes quote-doubling
    // silently corrupt names like don't) — lit() carries any name intact
    val rows = steps.zipWithIndex.map { case (s, i) =>
      struct(lit(i).as("step_idx"), lit(s).as("step"),
        col(s"c$i").as("users"))
    }
    counts.select(explode(array(rows: _*)).as("r"))
      .select(col("r.step_idx"), col("r.step"), col("r.users"))
      .orderBy("step_idx")
  }

  /** Cohort retention matrix: users cohorted by first-activity date;
    * one row per (cohort_date, day_offset) with distinct active users.
    * Rows whose timestamp is NULL or unparseable are EXCLUDED up
    * front — try_to_date (not to_date) because under Spark's default
    * ANSI mode a plain to_date THROWS on a malformed string input (the
    * gapFillDailyCounts discipline); kept, such rows would surface as
    * a phantom (NULL, NULL) cohort cell rather than fail visibly. */
  def cohortRetention(events: DataFrame, user: String, ts: String): DataFrame = {
    val e = events.select(col(user),
        call_function("try_to_date", col(ts)).as("_d"))
      .filter(col("_d").isNotNull)
    val cohorts = e.groupBy(col(user)).agg(min(col("_d")).as("cohort_date"))
    e.join(cohorts, user)
      .groupBy(col("cohort_date"),
        datediff(col("_d"), col("cohort_date")).cast("long").as("day_offset"))
      .agg(countDistinct(col(user)).as("active_users"))
  }

  /** Gap-filled daily counts: one row per (event type, day) across the
    * FULL observed date span, zero-filled where no events occurred —
    * the date-spine join every dashboard needs (a groupBy alone
    * silently drops empty days). The spine derives from a 1-row
    * min/max aggregate exploded through `sequence` (no driver loop),
    * the type dim is a distinct scan, and both sides of the
    * spine×types cross join are tiny derived dimensions (days ×
    * types), so the only data-scale work is the one daily-count
    * shuffle. */
  def gapFillDailyCounts(events: DataFrame, typeCol: String,
      ts: String): DataFrame = {
    // NULL types AND NULL/unparseable dates are excluded up front: a
    // NULL on either key would enter its dim via distinct() but never
    // match the equi-join below, so real daily counts would silently
    // render as a zero-filled series (and an all-null-date input would
    // return zero rows instead of failing visibly). try_to_date (not
    // to_date) because under Spark's default ANSI mode a plain to_date
    // THROWS on a malformed string — the documented exclusion would
    // otherwise only cover genuinely-NULL inputs
    val e = events.filter(col(typeCol).isNotNull)
      .select(col(typeCol).as("event_type"),
        call_function("try_to_date", col(ts)).as("d"))
      .filter(col("d").isNotNull)
    val spine = e.agg(min(col("d")).as("lo"), max(col("d")).as("hi"))
      .select(explode(sequence(col("lo"), col("hi"))).as("d"))
    val types = e.select("event_type").distinct()
    val cnt = e.groupBy("event_type", "d").agg(count(lit(1)).as("c"))
    spine.crossJoin(types)
      .join(cnt, Seq("event_type", "d"), "left")
      .select(col("event_type"), col("d"),
        coalesce(col("c"), lit(0L)).as("cnt"))
  }

  /** Conversion attribution: for each `convType` event, its FIRST- and
    * LAST-touch among `touchTypes` events of the same user within the
    * `lookback` window before (and including) the conversion —
    * unattributed conversions survive with NULL touches.
    *
    * Shape: a per-user interval join (equi key + bounded time range,
    * watermark-evictable if streamed) feeding one struct-argmax
    * aggregate per conversion — the first/last pick is
    * `min/max(struct(ts, id, type))`, whose lexicographic (ts, id)
    * order makes ties deterministic on both engines. No window over
    * the event log, no per-user sort; the only shuffle keys are
    * user (join) and conversion id (agg). */
  def attribution(events: DataFrame, idCol: String, user: String,
      typeCol: String, ts: String, convType: String,
      touchTypes: Seq[String], lookback: String): DataFrame = {
    val conv = events.filter(col(typeCol) === convType)
      .select(col(idCol).as("conv_id"), col(user).as("user_id"),
        col(ts).as("cts"))
    val touch = events.filter(col(typeCol).isin(touchTypes: _*))
      .select(col(idCol).as("touch_id"), col(user).as("_tu"),
        col(ts).as("tts"), col(typeCol).as("touch_type"))
    val j = conv.join(touch,
      col("user_id") === col("_tu") &&
        col("tts") <= col("cts") &&
        col("tts") >= col("cts") - expr(s"INTERVAL $lookback"))
    val agg = j.groupBy("conv_id").agg(
      max(struct(col("tts"), col("touch_id"), col("touch_type"))).as("l"),
      min(struct(col("tts"), col("touch_id"), col("touch_type"))).as("f"),
      count(lit(1)).as("n_touches"))
    conv.join(agg, Seq("conv_id"), "left")
      .select(col("conv_id"), col("user_id"),
        col("l.touch_id").as("last_id"),
        col("l.touch_type").as("last_type"),
        col("f.touch_id").as("first_id"),
        col("f.touch_type").as("first_type"),
        coalesce(col("n_touches"), lit(0L)).as("n_touches"))
  }

  /** First and last event type per user (ties broken by `tieCol`) — the
    * entry/exit view of a user journey, one window pass. */
  def firstLastEvent(events: DataFrame, user: String, typeCol: String,
      ts: String, tieCol: String): DataFrame =
    // struct-argmax (the attribution idiom): min/max(struct(ts, tie,
    // type)) per user — ONE partial-aggregating shuffle of user-sized
    // rows. The former full-frame window + distinct() sorted the whole
    // event log per user and shuffled it twice for identical results.
    events
      .groupBy(col(user))
      .agg(
        min(struct(col(ts), col(tieCol), col(typeCol))).as("_f"),
        max(struct(col(ts), col(tieCol), col(typeCol))).as("_l"))
      .select(col(user),
        col("_f").getField(typeCol).as("first_ev"),
        col("_l").getField(typeCol).as("last_ev"))

  /** Gaps-and-islands sessionization: one row per (user, session) with
    * start/end timestamps and event count. A new session starts when the
    * gap to the previous event exceeds `gapSeconds` (strictly). Gap
    * arithmetic is exact microsecond integers (`unix_micros`), so the
    * session boundaries — and the oracle replay — are bit-deterministic.
    *
    * Scale shape: everything lives in ONE hash partitioning by `user`
    * (lag flag, running sum, and the per-session agg all share the
    * (user) grouping — the agg is a partial over already-co-located
    * rows). No join, no second shuffle; state per task is one sort run.
    * Ties on `ts` break by `tieCol` so the order — hence the lag — is a
    * total order. */
  def sessionize(events: DataFrame, user: String, ts: String,
      tieCol: String, gapSeconds: Long): DataFrame = {
    val ord = Window.partitionBy(col(user)).orderBy(col(ts), col(tieCol))
    // cast first: parquet timestamps arrive as TIMESTAMP_NTZ and
    // unix_micros only accepts TIMESTAMP_LTZ; under the UTC session TZ
    // the NTZ->LTZ cast is value-preserving
    val us = unix_micros(col(ts).cast("timestamp"))
    val flagged = events
      .select(col(user), col(ts), col(tieCol))
      .withColumn("_new",
        when(us - lag(us, 1).over(ord) <= gapSeconds * 1000000L, lit(0L))
          .otherwise(lit(1L))) // first row per user: lag NULL -> 1
    val numbered = flagged.withColumn("session_num",
      sum(col("_new")).over(ord.rowsBetween(Window.unboundedPreceding, 0)))
    numbered.groupBy(col(user), col("session_num"))
      .agg(min(col(ts)).as("session_start"),
        max(col(ts)).as("session_end"),
        count(lit(1)).as("n_events"))
  }

  /** First-order Markov transition matrix over per-user event
    * sequences: one row per observed (prev_ev, next_ev) pair with the
    * transition count and its probability in EXACT ppm of the prev
    * row-total (`1e6 · cnt div Σcnt`, floor division — no float in the
    * contract). The "what happens after a user does X" table feeding
    * next-action prediction and anomalous-flow detection.
    *
    * Scale shape: ONE window pass in a (user)-partitioning derives the
    * successor (lead), then a (prev, next)-keyed count collapses the
    * log to a #types² frame — the row-total window runs on THAT tiny
    * aggregated frame, not the log. Ties on `ts` break by `tieCol` so
    * each user's sequence — hence every transition — is a total order
    * both engines replay. */
  def transitionMatrix(events: DataFrame, user: String, typeCol: String,
      ts: String, tieCol: String): DataFrame = {
    val ord = Window.partitionBy(col(user)).orderBy(col(ts), col(tieCol))
    val counts = events.select(col(user), col(typeCol), col(ts), col(tieCol))
      .withColumn("_next", lead(col(typeCol), 1).over(ord))
      .filter(col("_next").isNotNull)
      .groupBy(col(typeCol).as("prev_ev"), col("_next").as("next_ev"))
      .agg(count(lit(1)).as("cnt"))
    // row-normalize on the aggregated (#types²-row) frame
    val rowTotal = Window.partitionBy(col("prev_ev"))
    counts
      .withColumn("_tot", sum(col("cnt")).over(rowTotal))
      .withColumn("p_ppm", expr("(1000000 * cnt) div _tot"))
      .drop("_tot")
  }

  /** Per-key union length of (possibly overlapping) time intervals —
    * total covered microseconds, the uptime / ad-exposure / "time
    * actually watching" metric a naive `sum(end - start)` double-counts.
    * `startUs`/`endUs` are microsecond-integer columns (exact — derive
    * them with `unix_micros(col(ts).cast("timestamp"))`; the cast is
    * required because parquet timestamps read as TIMESTAMP_NTZ, which
    * `unix_micros` rejects); empty/negative intervals contribute 0.
    *
    * Gaps-and-islands in ONE hash partitioning by `key` (the
    * [[sessionize]] discipline): a running max of interval ends flags
    * island starts (`start > max(end) so far`), a running sum numbers
    * the islands, and the per-island rollup `max(end) - min(start)`
    * sums to the answer — no self-join, no second shuffle, state per
    * task is one sort run. */
  def intervalUnion(intervals: DataFrame, key: String,
      startUs: String, endUs: String): DataFrame = {
    val cleaned = intervals
      .select(col(key), col(startUs).as("_s"), col(endUs).as("_e"))
      .filter(col("_e") > col("_s"))
    val ord = Window.partitionBy(col(key)).orderBy(col("_s"), col("_e"))
    val prevMaxEnd = max(col("_e"))
      .over(ord.rowsBetween(Window.unboundedPreceding, -1))
    val flagged = cleaned.withColumn("_new",
      when(col("_s") <= prevMaxEnd, lit(0L)).otherwise(lit(1L)))
    val islands = flagged.withColumn("_island",
      sum(col("_new")).over(ord.rowsBetween(Window.unboundedPreceding, 0)))
    islands.groupBy(col(key), col("_island"))
      .agg((max(col("_e")) - min(col("_s"))).as("_len"))
      .groupBy(col(key))
      .agg(sum(col("_len")).as("covered_us"),
        count(lit(1)).as("n_islands"))
  }

  /** Kaplan-Meier survival estimator (Kaplan & Meier 1958) with
    * right-censoring — the survival-curve step past [[f09-style]]
    * time-to-event histograms: subjects enroll at their first
    * `startType` event, "die" at their first at-or-later `eventType`
    * event, and are censored at `horizonHours` if no event lands inside
    * the horizon. One row per distinct duration hour:
    * (t, n_risk, d, c, survival).
    *
    * Exactness: durations are exact integer microsecond diffs floored
    * to hours; risk sets and event counts are integers; the survival
    * product Π(1 − d/n) is computed as exp of a running sum of
    * DECIMAL(28,14)-quantized `ln(1 − d/n)` terms (the t12 recipe), so
    * the cumulative sum is order-exact and the DuckDB oracle replays it
    * bit-for-bit before the final round. A terminal riskset with d = n
    * (nobody left censored) would hit ln(0): those rows render survival
    * 0.0 and contribute no term, mirrored in the oracle.
    *
    * Scale shape: two filtered min-aggregates by subject (one shuffle
    * each), a subject-sized left join, then all curve arithmetic runs
    * on the DISTINCT-DURATION frame — at most `horizonHours`+1 rows, so
    * the unpartitioned cumulative windows are bounded by the horizon
    * constant, not the corpus. */
  def kaplanMeier(events: DataFrame, user: String, ts: String,
      typeCol: String, startType: String, eventType: String,
      horizonHours: Long): DataFrame = {
    val us = unix_micros(col(ts).cast("timestamp"))
    val e = events.select(col(user).as("_u"), col(typeCol).as("_ty"),
      us.as("_us"))
    val su = e.filter(col("_ty") === startType)
      .groupBy("_u").agg(min(col("_us")).as("_s0"))
    val pu = e.filter(col("_ty") === eventType)
      .join(su, "_u").filter(col("_us") >= col("_s0"))
      .groupBy("_u").agg(min(col("_us")).as("_p0"))
    val durHours = expr("(_p0 - _s0) div 3600000000")
    val inside = col("_p0").isNotNull && durHours < horizonHours
    val obs = su.join(pu, Seq("_u"), "left")
      .select(
        when(inside, lit(1L)).otherwise(lit(0L)).as("ev"),
        when(inside, durHours).otherwise(lit(horizonHours)).as("t"))
    val agg = obs.groupBy("t")
      .agg(sum(col("ev")).as("d"), sum(lit(1L) - col("ev")).as("c"))
    val backward = Window.orderBy(col("t").desc)
    val forward = Window.orderBy(col("t"))
    val withN = agg.withColumn("n_risk", sum(col("d") + col("c")).over(backward))
    val term = when(col("d") > 0 && col("d") < col("n_risk"),
      log(lit(1.0) - col("d").cast("double") / col("n_risk")))
      .otherwise(lit(0.0)).cast("decimal(28,14)")
    withN.withColumn("_cum", sum(term).over(forward))
      .select(col("t"), col("n_risk"), col("d"), col("c"),
        round(when(col("d") < col("n_risk"),
          exp(col("_cum").cast("double"))).otherwise(lit(0.0)), 4)
          .as("survival"))
  }
}
