package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RankTestSpec extends SparkSpec {
  import spark.implicits._

  test("separated arms: U hits the maximum and z matches the closed form") {
    // A = 1,2,3; B = 4,5,6: U_B = 9 (every pair a B win), mu = 4.5,
    // var = 9*7/12 = 5.25, z = 4.5/sqrt(5.25) = 1.9640
    val df = Seq((false, 1.0), (false, 2.0), (false, 3.0),
      (true, 4.0), (true, 5.0), (true, 6.0)).toDF("v", "x")
    val r = RankTest.mannWhitney(df, col("v"), col("x")).head()
    assert((r.getLong(0), r.getLong(1)) === ((3L, 3L)))
    assert(r.getLong(2) === 18L)  // 2*U_B
    assert(r.getLong(3) === 0L)   // no ties
    assert(r.getDouble(4) === 1.964)
  }

  test("ties: half-wins and the cubic correction match the hand trace") {
    // A = 1,1,2; B = 1,2,2: U_B = 1*(0+2)/... = 6 (hand-traced),
    // T = 2*(27-3) = 48, var = 0.75*(7 - 48/30) = 4.05,
    // z = 1.5/sqrt(4.05) = 0.7454
    val df = Seq((false, 1.0), (false, 1.0), (false, 2.0),
      (true, 1.0), (true, 2.0), (true, 2.0)).toDF("v", "x")
    val r = RankTest.mannWhitney(df, col("v"), col("x")).head()
    assert(r.getLong(2) === 12L && r.getLong(3) === 48L)
    assert(r.getDouble(4) === 0.7454)
  }

  test("symmetry: swapping arms negates z; U2 sides sum to 2*nA*nB") {
    val df = Seq((false, 1.0), (false, 3.0), (false, 3.0), (false, 7.0),
      (true, 2.0), (true, 3.0), (true, 9.0)).toDF("v", "x")
    val r = RankTest.mannWhitney(df, col("v"), col("x")).head()
    val s = RankTest.mannWhitney(df, !col("v"), col("x")).head()
    assert(r.getLong(2) + s.getLong(2) === 2L * r.getLong(0) * r.getLong(1))
    assert(r.getDouble(4) === -s.getDouble(4))
  }

  test("randomized brute-force agreement: U, ties, and z on 200 rows") {
    val rnd = new scala.util.Random(11)
    // heavy ties on purpose: values drawn from 12 levels
    val rows = Seq.fill(200)((rnd.nextBoolean(), (rnd.nextInt(12) + 1) / 4.0))
    val a = rows.filter(!_._1).map(r => math.round(r._2 * 100))
    val b = rows.filter(_._1).map(r => math.round(r._2 * 100))
    // brute O(nA*nB) doubled pairwise wins for arm B
    val u2Brute = b.map(x =>
      2L * a.count(_ < x) + a.count(_ == x)).sum
    val tBrute = rows.groupBy(r => math.round(r._2 * 100))
      .values.map(_.size.toLong).map(t => t * t * t - t).sum
    val r = RankTest.mannWhitney(rows.toDF("v", "x"), col("v"), col("x"))
      .head()
    assert((r.getLong(0), r.getLong(1)) === ((a.size.toLong, b.size.toLong)))
    assert(r.getLong(2) === u2Brute)
    assert(r.getLong(3) === tBrute)
    // z recomputed locally from the same integers and formula
    val (na, nb, n) = (a.size.toDouble, b.size.toDouble, rows.size.toDouble)
    val varU = (na * nb / 12.0) * ((n + 1.0) - tBrute / (n * (n - 1.0)))
    val zBrute = math.rint(
      (u2Brute - na * nb) / (2.0 * math.sqrt(varU)) * 1e4) / 1e4
    assert(r.getDouble(4) === zBrute)
  }

  test("degenerate inputs: one value only or an empty arm yield NULL z") {
    val oneVal = Seq((false, 5.0), (false, 5.0), (true, 5.0))
      .toDF("v", "x")
    val r = RankTest.mannWhitney(oneVal, col("v"), col("x")).head()
    assert(r.getLong(3) === 24L && r.isNullAt(4)) // 27-3, zero variance
    val oneArm = Seq((true, 1.0), (true, 2.0)).toDF("v", "x")
    assert(RankTest.mannWhitney(oneArm, col("v"), col("x"))
      .head().isNullAt(4))
    // NULL variant/value rows are excluded listwise
    val withNulls = Seq((Some(false), Some(1.0)), (None, Some(2.0)),
      (Some(true), None), (Some(true), Some(3.0))).toDF("v", "x")
    val r2 = RankTest.mannWhitney(withNulls, col("v"), col("x")).head()
    assert((r2.getLong(0), r2.getLong(1)) === ((1L, 1L)))
  }

  test("all-empty input: one row of zero counts, z NULL (no NULL longs)") {
    val allNull = Seq((Option.empty[Boolean], Option.empty[Double]))
      .toDF("v", "x")
    val r = RankTest.mannWhitney(allNull, col("v"), col("x")).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ===
      ((0L, 0L, 0L, 0L)))
    assert(r.isNullAt(4))
  }

  test("rocAuc: separable scores read 1e6, anti-separable 0, ties half") {
    def auc(rows: Seq[(Boolean, Double)]): Long =
      RankTest.rocAuc(rows.toDF("y", "s"), col("y"), col("s"))
        .head().getLong(3)
    assert(auc(Seq((false, 1.0), (false, 2.0), (true, 3.0), (true, 4.0)))
      === 1000000L)
    assert(auc(Seq((true, 1.0), (true, 2.0), (false, 3.0), (false, 4.0)))
      === 0L)
    // all-tied scores: every pair is a half-win, AUC = 0.5
    assert(auc(Seq((false, 5.0), (true, 5.0), (false, 5.0), (true, 5.0)))
      === 500000L)
  }

  test("rocAuc agrees with brute-force pairwise wins; gini = 2·auc − 1") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(150)((rnd.nextBoolean(), (rnd.nextInt(9) + 1) / 3.0))
    val neg = rows.filter(!_._1).map(r => math.round(r._2 * 100))
    val pos = rows.filter(_._1).map(r => math.round(r._2 * 100))
    val u2 = pos.map(x => 2L * neg.count(_ < x) + neg.count(_ == x)).sum
    val expect = BigInt(1000000) * u2 / (BigInt(neg.size) * pos.size * 2)
    val r = RankTest.rocAuc(rows.toDF("y", "s"), col("y"), col("s")).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) ===
      ((neg.size.toLong, pos.size.toLong, u2)))
    assert(r.getLong(3) === expect.toLong)
    assert(r.getLong(4) === 2 * expect.toLong - 1000000L)
  }

  test("ksTest: exact D numerator against brute-force CDF max") {
    val rnd = new scala.util.Random(23)
    val rows = Seq.fill(180)((rnd.nextBoolean(),
      if (rnd.nextBoolean()) rnd.nextInt(20) / 2.0 else rnd.nextInt(40) / 4.0))
    val a = rows.filter(!_._1).map(r => math.round(r._2 * 100))
    val b = rows.filter(_._1).map(r => math.round(r._2 * 100))
    val support = (a ++ b).distinct.sorted
    val dBrute = support.map(v =>
      math.abs(a.count(_ <= v).toLong * b.size -
        b.count(_ <= v).toLong * a.size)).max
    val r = RankTest.ksTest(rows.toDF("v", "x"), col("v"), col("x")).head()
    assert((r.getLong(0), r.getLong(1)) === ((a.size.toLong, b.size.toLong)))
    assert(r.getLong(2) === dBrute)
    assert(r.getLong(3) ===
      (BigInt(1000000) * dBrute / (BigInt(a.size) * b.size)).toLong)
    val d = dBrute.toDouble / (a.size.toDouble * b.size)
    val lam = math.rint(d * math.sqrt(
      a.size.toDouble * b.size / (a.size + b.size)) * 1e4) / 1e4
    assert(r.getDouble(4) === lam)
  }

  test("ksTest: identical distributions read D = 0; disjoint read 1e6") {
    val same = Seq((false, 1.0), (true, 1.0), (false, 2.0), (true, 2.0))
    val r0 = RankTest.ksTest(same.toDF("v", "x"), col("v"), col("x")).head()
    assert(r0.getLong(2) === 0L && r0.getLong(3) === 0L)
    val disj = Seq((false, 1.0), (false, 2.0), (true, 9.0), (true, 10.0))
    val r1 = RankTest.ksTest(disj.toDF("v", "x"), col("v"), col("x")).head()
    assert(r1.getLong(3) === 1000000L)
    // empty input: zero counts, NULL d_ppm/lambda, no NULL longs
    val empty = Seq((Option.empty[Boolean], Option.empty[Double]))
      .toDF("v", "x")
    val re = RankTest.ksTest(empty, col("v"), col("x")).head()
    assert((re.getLong(0), re.getLong(1), re.getLong(2)) === ((0L, 0L, 0L)))
    assert(re.isNullAt(3) && re.isNullAt(4))
  }

  test("rocAuc with an empty class: counts kept, ppm columns NULL") {
    val onlyPos = Seq((true, 1.0), (true, 2.0)).toDF("y", "s")
    val r = RankTest.rocAuc(onlyPos, col("y"), col("s")).head()
    assert((r.getLong(0), r.getLong(1)) === ((0L, 2L)))
    assert(r.isNullAt(3) && r.isNullAt(4))
  }
}
