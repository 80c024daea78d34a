package graft.operators

import graft.SparkSpec

class StatsSpec extends SparkSpec {
  import spark.implicits._

  test("perfect linear, anti-linear, and hand-computed correlations") {
    val df = Seq((1.0, 2.0, 9.0, 1.0), (2.0, 4.0, 6.0, 3.0),
      (3.0, 6.0, 3.0, 2.0)).toDF("x", "y2x", "yneg", "yz")
    val out = Stats.corrMatrix(df, Seq("x", "y2x", "yneg", "yz"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), Option(r.get(3)).map(_ => r.getDouble(3))))
      .toMap
    assert(out(("x", "y2x")) === ((3L, Some(1.0))))
    assert(out(("x", "yneg")) === ((3L, Some(-1.0))))
    // x=(1,2,3), yz=(1,3,2): Σxy = 13, r = (3·13 − 6·6)/√(6·6) = 0.5
    assert(out(("x", "yz")) === ((3L, Some(0.5))))
    assert(out.size === 6) // upper triangle of 4 columns
  }

  test("constant columns yield NULL corr; NULL rows drop listwise") {
    val df = Seq((Some(1.0), 5.0, Some(1.0)), (Some(2.0), 5.0, Some(4.0)),
      (None, 5.0, Some(9.0)), (Some(3.0), 5.0, None))
      .toDF("x", "const", "y")
    val out = Stats.corrMatrix(df, Seq("x", "const", "y"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.isNullAt(3))).toMap
    // complete cases: rows 1 and 2 only -> n = 2 everywhere
    assert(out.values.forall(_._1 === 2L))
    assert(out(("x", "const"))._2 && out(("const", "y"))._2)
    assert(!out(("x", "y"))._2) // two points: |r| = 1, defined
  }

  test("matches a brute-force double computation to 4 digits") {
    val xs = (1 to 200).map(i => (i.toDouble,
      (i % 17).toDouble, ((i * 31) % 23).toDouble))
    val df = xs.toDF("a", "b", "c")
    def brute(u: Seq[Double], v: Seq[Double]): Double = {
      val n = u.size
      val (su, sv) = (u.sum, v.sum)
      val (suu, svv) = (u.map(x => x * x).sum, v.map(x => x * x).sum)
      val suv = u.zip(v).map { case (x, y) => x * y }.sum
      (n * suv - su * sv) /
        math.sqrt((n * suu - su * su) * (n * svv - sv * sv))
    }
    val exp = Map(
      ("a", "b") -> brute(xs.map(_._1), xs.map(_._2)),
      ("a", "c") -> brute(xs.map(_._1), xs.map(_._3)),
      ("b", "c") -> brute(xs.map(_._2), xs.map(_._3)))
    val out = Stats.corrMatrix(df, Seq("a", "b", "c"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(3))
      .toMap
    for ((k, v) <- exp)
      assert(math.abs(out(k) - v) < 5e-5, s"$k: ${out(k)} vs $v")
  }
}
