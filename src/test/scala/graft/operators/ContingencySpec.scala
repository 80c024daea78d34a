package graft.operators

import graft.SparkSpec

class ContingencySpec extends SparkSpec {
  import spark.implicits._

  private def table(counts: (String, String, Int)*) =
    counts.flatMap { case (r, c, n) => Seq.fill(n)((r, c)) }
      .toDF("rr", "cc")

  test("2x2 chi-square and Cramér's V match the closed form") {
    // e = 15 everywhere; chi2 = 4·25/15 = 6.6667; V = sqrt(chi2/60)
    val df = table(("A", "x", 10), ("A", "y", 20),
      ("B", "x", 20), ("B", "y", 10))
    val r = Contingency.chiSquare(df, "rr", "cc").head()
    assert(r.getLong(0) === 60L)
    assert((r.getLong(1), r.getLong(2), r.getLong(3)) === ((2L, 2L, 1L)))
    assert(r.getDouble(4) === 6.6667)
    assert(r.getDouble(5) === 0.3333)
  }

  test("zero-observed cells contribute their expected value via the identity") {
    // (B,y) never observed: its term is e_By = 10·10/30 = 3.3333,
    // folded in as n − Σ_obs e; hand total = 7.5, V = sqrt(7.5/30)
    val df = table(("A", "x", 10), ("A", "y", 10), ("B", "x", 10))
    val r = Contingency.chiSquare(df, "rr", "cc").head()
    assert(r.getLong(0) === 30L && r.getLong(3) === 1L)
    assert(r.getDouble(4) === 7.5)
    assert(r.getDouble(5) === 0.5)
  }

  test("single-level side: chi2 0, V NULL; NULL categories are a level") {
    val one = table(("A", "x", 5), ("B", "x", 7))
    val r = Contingency.chiSquare(one, "rr", "cc").head()
    assert(r.getLong(3) === 0L && r.getDouble(4) === 0.0 && r.isNullAt(5))
    // NULL lang rows form their own column level: 2x2 again
    val withNull = Seq.fill(10)(("A", Some("x"))) ++
      Seq.fill(10)(("A", Option.empty[String])) ++
      Seq.fill(10)(("B", Some("x"))) ++
      Seq.fill(10)(("B", Option.empty[String]))
    val r2 = Contingency.chiSquare(withNull.toDF("rr", "cc"), "rr", "cc")
      .head()
    assert((r2.getLong(1), r2.getLong(2)) === ((2L, 2L)))
    assert(r2.getDouble(4) === 0.0) // perfectly balanced -> independent
  }
}
