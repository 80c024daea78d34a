package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** Window-function and grouping-set queries — the analytics surface a BI
  * consumer of the sales schema reaches next (top-n per group, running
  * totals, subtotal rollups). All with DuckDB oracles.
  *
  * Cross-engine determinism notes: window ORDER BYs are total (keys
  * appended); ROLLUP subtotal rows surface as 'ALL' via coalesce so no
  * NULL-ordering divergence (Spark sorts nulls first ASC, DuckDB last).
  */
object WindowQueries {

  // top-3 parts per brand by retail price — rank + filter
  private def w01(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("p_brand")
      .orderBy(col("p_retailprice").desc, col("p_partkey"))
    Tables(s, dir, "part")
      .select(col("p_brand"), col("p_partkey"), col("p_retailprice"),
        rank().over(w).as("rnk"))
      .filter(col("rnk") <= 3)
      .orderBy("p_brand", "rnk", "p_partkey")
  }

  // running revenue per customer over order dates
  private def w02(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables(s, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"),
        sum(col("o_totalprice").cast(DecimalType(18, 4))).over(w)
          .cast(DoubleType).as("running_total"))
      .orderBy("o_custkey", "o_orderkey")
      .limit(500)
  }

  // month × status rollup with subtotals (ROLLUP), 'ALL' for totals
  private def w03(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "orders")
      .rollup(date_format(col("o_orderdate"), "yyyy-MM").as("month"),
        col("o_orderstatus"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("o_totalprice").cast(DecimalType(18, 4)))
          .cast(DoubleType).as("total"))
      .select(coalesce(col("month"), lit("ALL")).as("month"),
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        col("cnt"), col("total"))
      .orderBy("month", "status")

  // exact discrete percentiles of order totals per status
  private def w04(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "orders")
      .groupBy("o_orderstatus")
      .agg(
        expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY o_totalprice)")
          .as("p50"),
        expr("percentile_disc(0.95) WITHIN GROUP (ORDER BY o_totalprice)")
          .as("p95"))
      .orderBy("o_orderstatus")

  // pivot-style conditional aggregation: event-type counts per user
  private def w05(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir, "events")
    e.groupBy("user_id")
      .agg(
        count(when(col("event_type") === "view", 1)).as("views"),
        count(when(col("event_type") === "click", 1)).as("clicks"),
        count(when(col("event_type") === "purchase", 1)).as("purchases"))
      .orderBy("user_id")
      .limit(300)
  }

  // CUBE: all grouping-set combinations of (priority, status)
  private def w06(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "orders")
      .cube(col("o_orderpriority"), col("o_orderstatus"))
      .agg(count(lit(1)).as("cnt"))
      .select(coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        col("cnt"))
      .orderBy("priority", "status")

  // set operations: customers with orders INTERSECT/EXCEPT semantics
  private def w07(s: SparkSession, dir: String): DataFrame = {
    val custs = Tables(s, dir, "customer").select(col("c_custkey").as("k"))
    val buyers = Tables(s, dir, "orders").select(col("o_custkey").as("k"))
    val both = custs.intersect(buyers)
    val never = custs.exceptAll(buyers).distinct()
    both.withColumn("side", lit("buyer"))
      .unionByName(never.withColumn("side", lit("nonbuyer")))
      .groupBy("side").agg(count(lit(1)).as("cnt"))
      .orderBy("side")
  }

  // time-RANGE frame: per-user trailing-1h event count and mean value.
  // Both engines order by integer MICROSECONDS (unix_micros/epoch_us) so
  // the frame bounds are exact; mean = decimal window sum / window count
  // (the w02 rendering pattern), rounded.
  private def w08(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(unix_micros(col("ts").cast("timestamp")))
      .rangeBetween(-3600000000L, 0L)
    Tables(s, dir, "events")
      .select(col("event_id"), col("user_id"),
        count(lit(1)).over(w).as("n_1h"),
        round(sum(col("value").cast("decimal(18,4)")).over(w)
          .cast("double") / count(lit(1)).over(w), 4).as("avg_1h"))
      .orderBy("event_id").limit(300)
  }

  // per-source length deciles (ntile) — quantile bucketing for mixing;
  // integer sort key + doc_id tie-break keeps it float-free
  private def w09(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("source")
      .orderBy(col("n_chars"), col("doc_id"))
    Tables(s, dir, "documents")
      .select(col("doc_id"), col("source"), col("n_chars"),
        ntile(10).over(w).as("decile"))
      .orderBy("doc_id").limit(300)
  }

  // bounded-state top-k per group (TopKAgg Aggregator): top-3 orders
  // per customer by exact cent price. The window formulation (w01's
  // shape) sorts every row of every group; this one is a partial+final
  // aggregate whose buffer holds <= 3 entries — per-group shuffle
  // volume is k rows per map partition, not the group. The oracle is
  // the window formulation, so the gate proves agg == window exactly.
  private def w10(s: SparkSession, dir: String): DataFrame = {
    val topk = udaf(new graft.functions.TopKAgg(3),
      org.apache.spark.sql.catalyst.encoders
        .ExpressionEncoder[(Long, Long)]())
    Tables(s, dir, "orders")
      .select(col("o_custkey"),
        round(col("o_totalprice") * 100).cast(LongType).as("cents"),
        col("o_orderkey"))
      .groupBy("o_custkey")
      .agg(topk(col("cents"), col("o_orderkey")).as("ids"))
      .select(col("o_custkey"),
        array_join(transform(col("ids"), i => i.cast("string")), ",")
          .as("top_orders"))
      .orderBy("o_custkey")
  }

  // arbitrary GROUPING SETS (the general form rollup/cube specialize):
  // three hand-picked sets with grouping_id disambiguating subtotal
  // levels — one Expand + one aggregate, same engine shape as w03/w06
  private def w11(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "orders")
      .groupingSets(
        Seq(Seq(col("o_orderstatus"), col("o_orderpriority")),
          Seq(col("o_orderpriority")), Seq()),
        col("o_orderstatus"), col("o_orderpriority"))
      .agg(grouping_id().as("gid"),
        count(lit(1)).as("cnt"),
        sum(col("o_totalprice").cast(DecimalType(18, 4)))
          .cast(DoubleType).as("total"))
      .select(coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("gid"), col("cnt"), col("total"))
      .orderBy("gid", "status", "priority")

  // relative-position window functions: percent_rank and cume_dist are
  // ratios of integers ((rank-1)/(n-1), rows<=current/n) — identical
  // IEEE division in both engines, so the doubles hash equal with no
  // rounding step
  private def w12(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("source")
      .orderBy(col("n_chars"), col("doc_id"))
    Tables(s, dir, "documents")
      .select(col("doc_id"), col("source"),
        percent_rank().over(w).as("pr"),
        cume_dist().over(w).as("cd"))
      .orderBy("doc_id").limit(300)
  }

  // offset/navigation window coverage: lead/lag with DEFAULTS (the
  // partition-edge case), nth_value over the full frame, and
  // last_value IGNORE NULLS (carry-forward over the events table's
  // genuinely-null values) — each frame spelled identically on both
  // engines
  private def w13(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts"), col("event_id"))
    val full = w.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    val toHere = w.rowsBetween(Window.unboundedPreceding,
      Window.currentRow)
    Tables(s, dir, "events")
      .select(col("event_id"),
        round(lead(col("value"), 1, -1.0).over(w), 4).as("next_value"),
        lag(col("event_type"), 2, "none").over(w).as("lag2_type"),
        nth_value(col("event_id"), 3).over(full).as("third_id"),
        round(last(col("value"), ignoreNulls = true).over(toHere), 4)
          .as("last_nonnull"))
      .orderBy("event_id").limit(300)
  }

  // UNPIVOT (melt): the wide per-user count matrix back to long form —
  // the inverse surface of w05's pivot. Native Dataset.unpivot: a
  // per-row Expand projection, no shuffle beyond the upstream agg.
  private def w14(s: SparkSession, dir: String): DataFrame = {
    val wide = Tables(s, dir, "events")
      .groupBy("user_id")
      .agg(
        count(when(col("event_type") === "view", 1)).as("views"),
        count(when(col("event_type") === "click", 1)).as("clicks"),
        count(when(col("event_type") === "purchase", 1)).as("purchases"))
    wide.unpivot(Array(col("user_id")),
        Array(col("views"), col("clicks"), col("purchases")),
        "metric", "cnt")
      .orderBy("user_id", "metric")
  }

  // RANGE frame (value-based, not row-based): per customer, the total
  // spent in the trailing 30 DAYS of each order — peers with the same
  // date all join the frame, so the result is tie-order independent.
  // Day arithmetic on unix_date keeps the bound exact.
  private def w15(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy(col("_days"))
      .rangeBetween(-30, 0)
    Tables(s, dir, "orders")
      .withColumn("_d", to_date(col("o_orderdate")))
      .withColumn("_days", unix_date(col("_d")))
      .withColumn("trailing30",
        sum(col("o_totalprice").cast("decimal(18,2)")).over(w)
          .cast("decimal(28,2)").cast("string"))
      .select(col("o_custkey"), col("o_orderkey"),
        col("_d").as("o_orderdate"), col("trailing30"))
      .orderBy("o_custkey", "o_orderkey")
      .limit(500)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "w15_range_frame" -> (w15 _),
    "w14_unpivot" -> (w14 _),
    "w01_rank_topn" -> (w01 _),
    "w02_running_total" -> (w02 _),
    "w03_rollup" -> (w03 _),
    "w04_percentiles" -> (w04 _),
    "w05_pivot_counts" -> (w05 _),
    "w06_cube" -> (w06 _),
    "w07_set_ops" -> (w07 _),
    "w08_moving_avg" -> (w08 _),
    "w09_ntile" -> (w09 _),
    "w10_topk_agg" -> (w10 _),
    "w11_grouping_sets" -> (w11 _),
    "w12_percent_rank" -> (w12 _),
    "w13_offset_nav" -> (w13 _),
  )

  val oracleSql: Map[String, String] = Map(
    "w15_range_frame" ->
      ("SELECT o_custkey, o_orderkey, " +
        "CAST(o_orderdate AS DATE) AS o_orderdate, " +
        "CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (" +
        "PARTITION BY o_custkey ORDER BY CAST(o_orderdate AS DATE) " +
        "RANGE BETWEEN INTERVAL 30 DAY PRECEDING AND CURRENT ROW) " +
        "AS DECIMAL(28,2)) AS VARCHAR) AS trailing30 " +
        "FROM orders ORDER BY o_custkey, o_orderkey LIMIT 500"),
    "w14_unpivot" ->
      ("WITH wide AS (SELECT user_id, " +
        "count(CASE WHEN event_type = 'view' THEN 1 END) AS views, " +
        "count(CASE WHEN event_type = 'click' THEN 1 END) AS clicks, " +
        "count(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchases " +
        "FROM events GROUP BY user_id) " +
        "SELECT user_id, metric, cnt FROM (" +
        "SELECT user_id, 'views' AS metric, views AS cnt FROM wide " +
        "UNION ALL SELECT user_id, 'clicks', clicks FROM wide " +
        "UNION ALL SELECT user_id, 'purchases', purchases FROM wide) " +
        "ORDER BY user_id, metric"),
    "w01_rank_topn" ->
      ("SELECT p_brand, p_partkey, p_retailprice, " +
        "rank() OVER (PARTITION BY p_brand " +
        "ORDER BY p_retailprice DESC, p_partkey) AS rnk " +
        "FROM part QUALIFY rnk <= 3 ORDER BY p_brand, rnk, p_partkey"),
    "w02_running_total" ->
      ("SELECT o_custkey, o_orderkey, " +
        "CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) OVER " +
        "(PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) " +
        "AS running_total " +
        "FROM orders ORDER BY o_custkey, o_orderkey LIMIT 500"),
    "w03_rollup" ->
      ("SELECT coalesce(strftime(o_orderdate, '%Y-%m'), 'ALL') AS month, " +
        "coalesce(o_orderstatus, 'ALL') AS status, count(*) AS cnt, " +
        "CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total " +
        "FROM orders GROUP BY ROLLUP (strftime(o_orderdate, '%Y-%m'), " +
        "o_orderstatus) ORDER BY month, status"),
    "w04_percentiles" ->
      ("SELECT o_orderstatus, " +
        "percentile_disc(0.5) WITHIN GROUP (ORDER BY o_totalprice) AS p50, " +
        "percentile_disc(0.95) WITHIN GROUP (ORDER BY o_totalprice) AS p95 " +
        "FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus"),
    "w05_pivot_counts" ->
      ("SELECT user_id, " +
        "count(CASE WHEN event_type = 'view' THEN 1 END) AS views, " +
        "count(CASE WHEN event_type = 'click' THEN 1 END) AS clicks, " +
        "count(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchases " +
        "FROM events GROUP BY user_id ORDER BY user_id LIMIT 300"),
    "w06_cube" ->
      ("SELECT coalesce(o_orderpriority, 'ALL') AS priority, " +
        "coalesce(o_orderstatus, 'ALL') AS status, count(*) AS cnt " +
        "FROM orders GROUP BY CUBE (o_orderpriority, o_orderstatus) " +
        "ORDER BY priority, status"),
    "w07_set_ops" ->
      ("WITH c AS (SELECT c_custkey AS k FROM customer), " +
        "o AS (SELECT o_custkey AS k FROM orders), " +
        "b AS (SELECT k, 'buyer' AS side FROM (SELECT k FROM c INTERSECT SELECT k FROM o)), " +
        "n AS (SELECT DISTINCT k, 'nonbuyer' AS side FROM (SELECT k FROM c EXCEPT SELECT k FROM o)) " +
        "SELECT side, count(*) AS cnt FROM (SELECT * FROM b UNION ALL SELECT * FROM n) " +
        "GROUP BY side ORDER BY side"),
    "w08_moving_avg" ->
      ("SELECT event_id, user_id, count(*) OVER w AS n_1h, " +
        "round(CAST(sum(CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE) " +
        "/ count(*) OVER w, 4) AS avg_1h FROM events " +
        "WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts) " +
        "RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) " +
        "ORDER BY event_id LIMIT 300"),
    "w09_ntile" ->
      ("SELECT doc_id, source, n_chars, ntile(10) OVER (" +
        "PARTITION BY source ORDER BY n_chars, doc_id) AS decile " +
        "FROM documents ORDER BY doc_id LIMIT 300"),
    "w10_topk_agg" ->
      ("WITH r AS (SELECT o_custkey, o_orderkey, " +
        "row_number() OVER (PARTITION BY o_custkey ORDER BY " +
        "CAST(round(o_totalprice * 100) AS BIGINT) DESC, o_orderkey) AS rn " +
        "FROM orders) " +
        "SELECT o_custkey, array_to_string(" +
        "list(o_orderkey ORDER BY rn), ',') AS top_orders " +
        "FROM r WHERE rn <= 3 GROUP BY o_custkey ORDER BY o_custkey"),
    "w11_grouping_sets" ->
      ("SELECT coalesce(o_orderstatus, 'ALL') AS status, " +
        "coalesce(o_orderpriority, 'ALL') AS priority, " +
        "CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid, " +
        "count(*) AS cnt, " +
        "CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total " +
        "FROM orders GROUP BY GROUPING SETS " +
        "((o_orderstatus, o_orderpriority), (o_orderpriority), ()) " +
        "ORDER BY gid, status, priority"),
    "w12_percent_rank" ->
      ("SELECT doc_id, source, " +
        "percent_rank() OVER w AS pr, cume_dist() OVER w AS cd " +
        "FROM documents " +
        "WINDOW w AS (PARTITION BY source ORDER BY n_chars, doc_id) " +
        "ORDER BY doc_id LIMIT 300"),
    "w13_offset_nav" ->
      ("WITH e AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS t, " +
        "event_type, value FROM events) " +
        "SELECT event_id, " +
        "round(lead(value, 1, -1.0) OVER w, 4) AS next_value, " +
        "lag(event_type, 2, 'none') OVER w AS lag2_type, " +
        "nth_value(event_id, 3) OVER (PARTITION BY user_id " +
        "ORDER BY t, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND " +
        "UNBOUNDED FOLLOWING) AS third_id, " +
        "round(last_value(value IGNORE NULLS) OVER (PARTITION BY user_id " +
        "ORDER BY t, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND " +
        "CURRENT ROW), 4) AS last_nonnull " +
        "FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id) " +
        "ORDER BY event_id LIMIT 300"),
  )
}
