package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

class ScdSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("type2: runs compress, intervals chain, last run open") {
    val obs = Seq(
      (1L, 10L, ts("2025-01-01 00:00:00"), "A"),
      (1L, 11L, ts("2025-01-02 00:00:00"), "A"), // same value: same run
      (1L, 12L, ts("2025-01-05 00:00:00"), "B"),
      (1L, 13L, ts("2025-01-09 00:00:00"), "A"), // A again: NEW run
      (2L, 20L, ts("2025-02-01 00:00:00"), "X"))
      .toDF("ent", "id", "t", "v")
    val out = Scd.type2(obs, "ent", "t", "v", "id")
      .orderBy("ent", "version")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getTimestamp(3), Option(r.getTimestamp(4)), r.getBoolean(5),
        r.getLong(6)))
    assert(out.toSeq === Seq(
      (1L, 1L, "A", ts("2025-01-01 00:00:00"),
        Some(ts("2025-01-05 00:00:00")), false, 2L),
      (1L, 2L, "B", ts("2025-01-05 00:00:00"),
        Some(ts("2025-01-09 00:00:00")), false, 1L),
      (1L, 3L, "A", ts("2025-01-09 00:00:00"), None, true, 1L),
      (2L, 1L, "X", ts("2025-02-01 00:00:00"), None, true, 1L)))
  }

  test("type2: equal-ts observations ordered by tie column") {
    val obs = Seq(
      (1L, 2L, ts("2025-01-01 00:00:00"), "B"),
      (1L, 1L, ts("2025-01-01 00:00:00"), "A"))
      .toDF("ent", "id", "t", "v")
    val out = Scd.type2(obs, "ent", "t", "v", "id")
      .orderBy("version").select("value").as[String].collect()
    assert(out.toSeq === Seq("A", "B"))
  }

  test("type2: NULL values form runs like any other value") {
    val obs = Seq(
      (1L, 1L, ts("2025-01-01 00:00:00"), Some("A")),
      (1L, 2L, ts("2025-01-02 00:00:00"), None),
      (1L, 3L, ts("2025-01-03 00:00:00"), None),
      (1L, 4L, ts("2025-01-04 00:00:00"), Some("A")))
      .toDF("ent", "id", "t", "v")
    val out = Scd.type2(obs, "ent", "t", "v", "id")
      .orderBy("version")
      .collect().map(r => (r.getLong(1), Option(r.getString(2)), r.getLong(6)))
    assert(out.toSeq === Seq((1L, Some("A"), 1L), (2L, None, 2L),
      (3L, Some("A"), 1L)))
  }

  test("type2 rejects an entity column named like an output column") {
    // the output projects `entity` next to fixed aliases — an entity
    // literally named "value"/"version"/... would emit duplicates
    val obs = Seq((1L, 1L, ts("2025-01-01 00:00:00"), "A"))
      .toDF("value", "id", "t", "v")
    val e = intercept[IllegalArgumentException] {
      Scd.type2(obs, "value", "t", "v", "id")
    }
    assert(e.getMessage.contains("collides"))
  }

  test("type2: a NULL FIRST value still numbers versions from 1") {
    // r7 review fix: lag() is NULL on the first row, and NULL <=> NULL
    // made the opening _chg 0 — a NULL-first entity numbered from 0
    // while every other entity numbers from 1
    import java.sql.Timestamp
    val obs = Seq(
      (1L, Timestamp.valueOf("2024-01-01 00:00:00"), null: String, 1L),
      (1L, Timestamp.valueOf("2024-01-02 00:00:00"), "A", 2L))
      .toDF("entity", "obs_ts", "value", "obs_id")
    val out = Scd.type2(obs, "entity", "obs_ts", "value", "obs_id")
      .orderBy("version")
      .collect().map(r => (r.getLong(1), Option(r.getString(2))))
    assert(out.toSeq === Seq((1L, None), (2L, Some("A"))))
  }
}
