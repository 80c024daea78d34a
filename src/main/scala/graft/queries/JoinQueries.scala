package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.AsOfJoin

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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "a01_asof_join" -> (a01 _),
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
  )
}
