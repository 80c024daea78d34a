package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{AsOfJoin, RangeJoin}

/** Specialized join queries. a01 checks the composed as-of join against
  * DuckDB's NATIVE `ASOF JOIN` — a strong cross-implementation oracle.
  */
object JoinQueries {

  // for each click, the most recent prior 'view' value per user
  private def a01(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir, "events")
    val clicks = e.filter(col("event_type") === "click")
      .select("event_id", "user_id", "ts")
    val views = e.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts").as("vts"),
        col("value"))
    AsOfJoin.backward(clicks, views, Seq("user_id"), "ts", "vts",
      Seq("value"))
      .select(col("event_id"), col("asof_ts"), col("asof_value"))
      .orderBy("event_id")
      .limit(500)
  }

  // events landing in the hour after each signup of the same user
  private def a02(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir, "events")
    val signups = e.filter(col("event_type") === "signup")
      .select(col("event_id").as("signup_id"), col("user_id"),
        col("ts").as("w_start"),
        (col("ts") + expr("INTERVAL 1 HOUR")).as("w_end"))
    val ev = e.select(col("event_id"), col("user_id"), col("ts"))
    RangeJoin.binned(ev, "ts", signups, "w_start", "w_end",
      Seq("user_id"), binSeconds = 3600)
      .groupBy("signup_id").agg(count(lit(1)).as("cnt"))
      .orderBy("signup_id")
      .limit(500)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "a01_asof_join" -> (a01 _),
    "a02_range_join" -> (a02 _),
  )

  val oracleSql: Map[String, String] = Map(
    "a01_asof_join" ->
      ("WITH e AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, " +
        "event_type, value FROM events), " +
        "c AS (SELECT event_id, user_id, ts FROM e WHERE event_type = 'click'), " +
        "v AS (SELECT user_id, ts, value FROM e WHERE event_type = 'view') " +
        "SELECT c.event_id, v.ts AS asof_ts, v.value AS asof_value " +
        "FROM c ASOF LEFT JOIN v ON c.user_id = v.user_id AND c.ts >= v.ts " +
        "ORDER BY event_id LIMIT 500"),
    "a02_range_join" ->
      ("WITH e AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts " +
        "FROM events), " +
        "s AS (SELECT event_id AS signup_id, user_id, CAST(ts AS TIMESTAMP) AS w_start, " +
        "CAST(ts AS TIMESTAMP) + INTERVAL 1 HOUR AS w_end FROM events " +
        "WHERE event_type = 'signup') " +
        "SELECT s.signup_id, count(*) AS cnt FROM e JOIN s " +
        "ON e.user_id = s.user_id AND e.ts >= s.w_start AND e.ts <= s.w_end " +
        "GROUP BY s.signup_id ORDER BY s.signup_id LIMIT 500"),
  )
}
