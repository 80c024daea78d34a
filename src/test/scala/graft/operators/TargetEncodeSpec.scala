package graft.operators

import org.apache.spark.sql.functions.col

import graft.SparkSpec

class TargetEncodeSpec extends SparkSpec {
  import spark.implicits._

  private val rows = Seq(
    // category a: 3 rows, 2 positive; category b: 1 row, 0 positive
    ("a", 1), ("a", 1), ("a", 0), ("b", 0))

  test("encoding is the exact smoothed ppm arithmetic") {
    val df = rows.toDF("cat", "y")
    val out = TargetEncode.encode(df, "cat", col("y") === 1, m = 2)
      .orderBy("category")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    // global rate = 2/4 -> 500000 ppm
    // a: (1e6*2 + 2*500000) div (3+2) = 3000000 div 5 = 600000
    // b: (1e6*0 + 2*500000) div (1+2) = 1000000 div 3 = 333333
    assert(out === Seq(("a", 3L, 2L, 600000L), ("b", 1L, 0L, 333333L)))
  }

  test("m=0 degenerates to the raw per-category rate") {
    val out = TargetEncode.encode(rows.toDF("cat", "y"), "cat",
        col("y") === 1, m = 0)
      .orderBy("category")
      .collect().map(r => (r.getString(0), r.getLong(3)))
    assert(out === Seq(("a", 666666L), ("b", 0L)))
  }

  test("rare category shrinks toward the prior as m grows") {
    val df = rows.toDF("cat", "y")
    def encB(m: Long): Long = TargetEncode.encode(df, "cat",
        col("y") === 1, m)
      .filter(col("category") === "b").head().getLong(3)
    // b's raw rate is 0; with the global prior at 500000 ppm the
    // encoding climbs toward it monotonically in m
    assert(encB(0) === 0L)
    assert(encB(2) === 333333L)
    assert(encB(20) === 476190L)
    assert(encB(0) < encB(2) && encB(2) < encB(20))
  }
}
