package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("binned range join == naive theta join on real events") {
    val e = Tables(spark, "/root/testdata/sf0.001", "events")
    val signups = e.filter($"event_type" === "signup")
      .select($"event_id".as("signup_id"), $"user_id",
        $"ts".as("w_start"),
        ($"ts" + expr("INTERVAL 1 HOUR")).as("w_end"))
    val ev = e.select($"event_id", $"user_id", $"ts")

    val binned = RangeJoin.binned(ev, "ts", signups,
      "w_start", "w_end", Seq("user_id"), binSeconds = 3600)
      .select("signup_id", "event_id")

    val sAlias = signups.as("s")
    val naive = ev.as("e").join(sAlias,
      col("e.user_id") === col("s.user_id") &&
        col("e.ts") >= col("s.w_start") && col("e.ts") <= col("s.w_end"))
      .select(col("s.signup_id"), col("e.event_id"))

    assert(binned.exceptAll(naive).count() === 0)
    assert(naive.exceptAll(binned).count() === 0)
    assert(binned.count() > 0)
  }

  test("interval spanning many bins joins each left row exactly once") {
    val intervals = Seq((1L, "2025-01-01 00:00:30", "2025-01-01 03:59:30"))
      .toDF("k", "s", "e")
      .select($"k", to_timestamp($"s").as("s"), to_timestamp($"e").as("e"))
    val points = Seq((1L, 10L, "2025-01-01 02:00:00"),
      (1L, 11L, "2025-01-01 04:30:00"))
      .toDF("k", "id", "ts")
      .select($"k", $"id", to_timestamp($"ts").as("ts"))
    val out = RangeJoin.binned(points, "ts", intervals, "s", "e",
      Seq("k"), binSeconds = 600) // interval covers ~24 bins
      .select("id").as[Long].collect()
    assert(out.toSeq === Seq(10L)) // in-range once, out-of-range absent
  }
}
