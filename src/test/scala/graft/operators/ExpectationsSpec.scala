package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Expectations.RowCheck

class ExpectationsSpec extends SparkSpec {
  import spark.implicits._

  test("rowChecks: one scan, all checks, NULL-safe predicates") {
    val df = Seq((Some(1L), Some(5.0)), (None, Some(-1.0)),
      (Some(3L), None)).toDF("id", "v")
    val out = Expectations.rowChecks(df, "t", Seq(
        RowCheck("id_not_null", col("id").isNull),
        RowCheck("v_positive", col("v").isNull || col("v") <= 0)))
      .orderBy("check")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(out.toSeq === Seq(("t", "id_not_null", 1L),
      ("t", "v_positive", 2L)))
  }

  test("rowChecks rejects duplicate check names loudly") {
    // duplicate names become ambiguous aggregate aliases — the
    // tableReport guard, applied to the standalone path too
    val df = Seq(1L).toDF("id")
    val e = intercept[IllegalArgumentException] {
      Expectations.rowChecks(df, "t", Seq(
        RowCheck("same", col("id").isNull),
        RowCheck("same", col("id") < 0)))
    }
    assert(e.getMessage.contains("same"))
  }

  test("rowChecks runs as a single aggregate job") {
    val df = (1L to 100L).toDF("id")
    val jobs = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    Expectations.rowChecks(df, "t", Seq(
      RowCheck("a", col("id") < 0), RowCheck("b", col("id") > 1000),
      RowCheck("c", col("id").isNull))).collect()
    val after = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    assert(after - jobs <= 2) // one aggregate (AQE may add a stage job)
  }

  test("uniqueCheck counts surplus rows only") {
    val df = Seq(1L, 1L, 1L, 2L, 3L, 3L).toDF("k")
    val out = Expectations.uniqueCheck(df, "t", "k_unique", Seq("k"))
      .head()
    assert(out.getLong(2) === 3L) // two extra 1s + one extra 3
    val ok = Expectations.uniqueCheck(Seq(1L, 2L).toDF("k"), "t", "u",
      Seq("k")).head()
    assert(ok.getLong(2) === 0L)
  }

  test("fkCheck: orphans counted, NULL FKs exempt") {
    val child = Seq(Some(1L), Some(2L), Some(9L), None).toDF("fk")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val out = Expectations.fkCheck(child, "fk", parent, "pk", "t", "fk_ok")
      .head()
    assert(out.getLong(2) === 1L)
  }

  test("tableReport fuses row+unique+fk and matches the composed path") {
    // id 1 duplicated (2 surplus rows across keys 1,1,1 -> 2; 3,3 -> 1),
    // v<=0 violations on two rows, fk 9 orphaned, NULL fk exempt
    val child = Seq(
      (1L, 5.0, Some(10L)), (1L, -1.0, Some(10L)), (1L, 2.0, Some(20L)),
      (2L, 0.0, Some(9L)), (3L, 1.0, None), (3L, 4.0, Some(10L)))
      .toDF("k", "v", "fk")
    val parent = Seq(10L, 20L).toDF("pk")
    val fused = Expectations.tableReport(child, "t",
      Seq(Expectations.RowCheck("v_positive", $"v" <= 0)),
      uniqueName = "k_unique", keyCols = Seq("k"),
      fks = Seq(("fk_ok", "fk", parent, "pk")))
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(fused === Map("v_positive" -> 2L, "fk_ok" -> 1L,
      "k_unique" -> 3L))
    // parity with the composed primitives on the same inputs
    val composed = Expectations.rowChecks(child, "t",
        Seq(Expectations.RowCheck("v_positive", $"v" <= 0)))
      .unionByName(Expectations.uniqueCheck(child, "t", "k_unique",
        Seq("k")))
      .unionByName(Expectations.fkCheck(child, "fk", parent, "pk", "t",
        "fk_ok"))
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(fused === composed)
  }

  test("tableReport rejects colliding check names loudly") {
    val df = Seq((1L, 5.0)).toDF("k", "v")
    // duplicate row-check / unique names
    intercept[IllegalArgumentException] {
      Expectations.tableReport(df, "t",
        Seq(RowCheck("dup", $"v" <= 0), RowCheck("dup", $"v" > 9)),
        uniqueName = "k_unique", keyCols = Seq("k"))
    }
    // uniqueName colliding with a row check
    intercept[IllegalArgumentException] {
      Expectations.tableReport(df, "t",
        Seq(RowCheck("k_unique", $"v" <= 0)),
        uniqueName = "k_unique", keyCols = Seq("k"))
    }
    // check named like a key column or the internal counter
    intercept[IllegalArgumentException] {
      Expectations.tableReport(df, "t",
        Seq(RowCheck("k", $"v" <= 0)),
        uniqueName = "k_unique", keyCols = Seq("k"))
    }
    intercept[IllegalArgumentException] {
      Expectations.tableReport(df, "t",
        Seq(RowCheck("_c", $"v" <= 0)),
        uniqueName = "k_unique", keyCols = Seq("k"))
    }
  }

  test("tableReport on an empty table reports zero violations") {
    val empty = Seq.empty[(Long, Double)].toDF("k", "v")
    val out = Expectations.tableReport(empty, "t",
      Seq(Expectations.RowCheck("v_positive", $"v" <= 0)),
      uniqueName = "k_unique", keyCols = Seq("k"))
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(out === Map("v_positive" -> 0L, "k_unique" -> 0L))
  }
}
