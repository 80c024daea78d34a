package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("hand-built case: backward match, inclusive ties, no-match nulls") {
    val quotes = Seq(
      (1L, ts("2025-01-01 10:00:00"), 100.0),
      (1L, ts("2025-01-01 10:05:00"), 101.0),
      (2L, ts("2025-01-01 10:02:00"), 200.0))
      .toDF("k", "ts", "px")
    val trades = Seq(
      (1L, ts("2025-01-01 10:03:00"), "t1"), // matches 10:00 quote
      (1L, ts("2025-01-01 10:05:00"), "t2"), // tie: matches 10:05 (inclusive)
      (2L, ts("2025-01-01 10:01:00"), "t3"), // before any quote -> null
      (3L, ts("2025-01-01 10:00:00"), "t4")) // key with no quotes -> null
      .toDF("k", "ts", "id")
    val out = AsOfJoin.backward(trades, quotes, Seq("k"), "ts", "ts", Seq("px"))
      .orderBy("id").collect()
    assert(out.map(r => (r.getAs[String]("id"),
      Option(r.getAs[java.lang.Double]("asof_px")))).toSeq === Seq(
      ("t1", Some(100.0)), ("t2", Some(101.0)), ("t3", None), ("t4", None)))
  }

  test("agrees with brute-force computation on real events (sf0.001)") {
    val e = Tables(spark, "/root/testdata/sf0.001", "events")
    val clicks = e.filter($"event_type" === "click")
      .select("event_id", "user_id", "ts")
    val views = e.filter($"event_type" === "view")
      .select($"user_id", $"ts".as("vts"), $"value")

    val fast = AsOfJoin.backward(clicks, views, Seq("user_id"), "ts", "vts",
      Seq("value"))
      .select("event_id", "asof_ts", "asof_value")

    // brute force: theta-join all prior views, keep the latest per click
    // (left join keeps clicks with no prior view as null matches)
    val c = clicks.as("c")
    val v = views.as("v")
    val brute = c.join(v,
      col("c.user_id") === col("v.user_id") && col("v.vts") <= col("c.ts"),
      "left")
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("c.event_id"))
          .orderBy(col("v.vts").desc_nulls_last)))
      .filter($"rn" === 1)
      .select(col("c.event_id"), col("v.vts").as("asof_ts"),
        col("v.value").as("asof_value"))

    val diff = fast.exceptAll(brute).count() + brute.exceptAll(fast).count()
    assert(diff === 0)
    assert(fast.count() === clicks.count())
  }
}
