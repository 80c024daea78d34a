package graft.operators

import graft.SparkSpec

class RobustStatsSpec extends SparkSpec {
  import spark.implicits._

  test("madOutliers: hand-computed median, MAD, and flags") {
    // group g: values 1,2,3,4,100 -> lower median (rank 3) = 3;
    // |x-3| = 2,1,0,1,97 -> sorted 0,1,1,2,97, lower median (rank 3) = 1
    // outlier iff |x-3| > 3*1: only 100
    val df = Seq(("g", 1L), ("g", 2L), ("g", 3L), ("g", 4L), ("g", 100L))
      .toDF("grp", "v")
    val out = RobustStats.madOutliers(df, "grp", "v", k = 3)
      .orderBy("v")
      .collect().map(r => (r.getLong(r.fieldIndex("v")),
        r.getLong(r.fieldIndex("med")), r.getLong(r.fieldIndex("mad")),
        r.getBoolean(r.fieldIndex("is_outlier"))))
    assert(out.toSeq === Seq(
      (1L, 3L, 1L, false), (2L, 3L, 1L, false), (3L, 3L, 1L, false),
      (4L, 3L, 1L, false), (100L, 3L, 1L, true)))
  }

  test("madOutliers: even group uses lower median (rank ceil(n/2))") {
    // 1,2,3,4 -> rank (4+1) div 2 = 2 -> med 2; adev 1,0,1,2 -> mad 1
    val df = Seq(("g", 1L), ("g", 2L), ("g", 3L), ("g", 4L)).toDF("grp", "v")
    val row = RobustStats.madOutliers(df, "grp", "v", k = 3).head()
    assert(row.getLong(row.fieldIndex("med")) === 2L)
    assert(row.getLong(row.fieldIndex("mad")) === 1L)
  }

  test("madOutliers: groups are independent") {
    val df = Seq(("a", 10L), ("a", 10L), ("a", 1000L),
      ("b", 5L), ("b", 6L), ("b", 7L)).toDF("grp", "v")
    val out = RobustStats.madOutliers(df, "grp", "v", k = 3)
    val a = out.filter($"grp" === "a").orderBy("v")
      .select("med", "mad").collect().map(r => (r.getLong(0), r.getLong(1)))
    val b = out.filter($"grp" === "b").orderBy("v")
      .select("med", "mad").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(a.head === (10L, 0L) && b.head === (6L, 1L))
    // mad=0 in group a: 1000 flagged (|990| > 0), the 10s not (0 > 0 false)
    val flagged = out.filter($"is_outlier").select("grp", "v")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(flagged.toSeq === Seq(("a", 1000L)))
  }
}
