package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class AbTestSpec extends SparkSpec {
  import spark.implicits._

  test("counts, ppm rates, lift, and pooled z are exact") {
    // A: 4 users / 1 conversion, B: 4 users / 3 conversions
    val users = Seq(
      (false, true), (false, false), (false, false), (false, false),
      (true, true), (true, true), (true, true), (true, false))
      .toDF("variant", "converted")
    val r = AbTest.proportionTest(users, col("variant"), col("converted"))
      .head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((4L, 1L, 250000L)))
    assert((r.getLong(3), r.getLong(4), r.getLong(5)) === ((4L, 3L, 750000L)))
    assert(r.getLong(6) === 500000L)
    // z = (0.75 - 0.25) / sqrt(0.5 * 0.5 * (1/4 + 1/4)) = sqrt(2)
    assert(r.getDouble(7) === 1.4142)
  }

  test("degenerate pools and empty arms yield NULL z, not a crash") {
    // everyone converts: pooled variance 0
    val all = Seq((false, true), (true, true)).toDF("v", "c")
    assert(AbTest.proportionTest(all, col("v"), col("c")).head().isNullAt(7))
    // one arm empty
    val oneArm = Seq((true, true), (true, false)).toDF("v", "c")
    val r = AbTest.proportionTest(oneArm, col("v"), col("c")).head()
    assert(r.getLong(0) === 0L && r.isNullAt(7))
  }

  test("NULL variant rows are excluded; NULL converted counts as false") {
    val users = Seq((Some(false), Some(true)), (None, Some(true)),
      (Some(true), None), (Some(true), Some(true)))
      .toDF("v", "c")
    val r = AbTest.proportionTest(users, col("v"), col("c")).head()
    assert(r.getLong(0) === 1L && r.getLong(1) === 1L) // the null-v row gone
    assert(r.getLong(3) === 2L && r.getLong(4) === 1L) // null c = no conv
  }

  test("Welch t and Satterthwaite df match the closed form") {
    // A: 1,2,3 (var 1); B: 2,4,6 (var 4)
    // t = (4-2)/sqrt(1/3 + 4/3) = 1.5492
    // df = (5/3)^2 / ((1/9)/2 + (16/9)/2) = 50/17 = 2.9412
    val rows = Seq((false, 1.0), (false, 2.0), (false, 3.0),
      (true, 2.0), (true, 4.0), (true, 6.0)).toDF("v", "x")
    val r = AbTest.welchTTest(rows, col("v"), col("x")).head()
    assert((r.getLong(0), r.getLong(1)) === ((3L, 3L)))
    assert((r.getDouble(2), r.getDouble(3)) === ((2.0, 4.0)))
    assert(r.getDouble(4) === 1.5492)
    assert(r.getDouble(5) === 2.9412)
  }

  test("Welch guards: tiny arms and zero variance yield NULLs, not errors") {
    // one row in an arm: variance undefined -> t/df NULL, means still out
    val tiny = Seq((false, 3.0), (true, 5.0), (true, 7.0)).toDF("v", "x")
    val r1 = AbTest.welchTTest(tiny, col("v"), col("x")).head()
    assert(r1.getDouble(2) === 3.0 && r1.isNullAt(4) && r1.isNullAt(5))
    // both arms constant: se^2 = 0 -> no test
    val const = Seq((false, 5.0), (false, 5.0), (true, 5.0), (true, 5.0))
      .toDF("v", "x")
    val r2 = AbTest.welchTTest(const, col("v"), col("x")).head()
    assert(r2.isNullAt(4) && r2.isNullAt(5))
    // NULL variant and NULL value rows are excluded listwise
    val withNulls = Seq((Some(false), Some(1.0)), (Some(false), Some(2.0)),
      (None, Some(9.0)), (Some(true), None),
      (Some(true), Some(3.0)), (Some(true), Some(5.0))).toDF("v", "x")
    val r3 = AbTest.welchTTest(withNulls, col("v"), col("x")).head()
    assert((r3.getLong(0), r3.getLong(1)) === ((2L, 2L)))
  }

  test("CUPED: a lift fully explained by covariate imbalance adjusts to zero") {
    // y = x/10 exactly in both arms: raw lift 1.0 is pure covariate
    // imbalance. theta = cov/var = 330/3300 = 0.1; adj = 1 - 0.1*10 = 0;
    // var_ratio = 1 - rho^2 = 0 (fully explained)
    val rows = Seq((false, 1.0, 10.0), (false, 2.0, 20.0), (false, 3.0, 30.0),
      (true, 2.0, 20.0), (true, 3.0, 30.0), (true, 4.0, 40.0))
      .toDF("v", "y", "x")
    val r = AbTest.cuped(rows, col("v"), col("y"), col("x")).head()
    assert((r.getLong(0), r.getLong(1)) === ((3L, 3L)))
    assert(r.getDouble(2) === 1.0)    // raw lift
    assert(r.getDouble(3) === 0.1)    // theta
    assert(r.getDouble(4) === 0.0)    // adjusted lift
    assert(r.getDouble(5) === 0.0)    // variance ratio
  }

  test("CUPED guards: constant covariate yields NULL theta/adj, raw lift stays") {
    val rows = Seq((false, 1.0, 5.0), (false, 2.0, 5.0),
      (true, 3.0, 5.0), (true, 4.0, 5.0)).toDF("v", "y", "x")
    val r = AbTest.cuped(rows, col("v"), col("y"), col("x")).head()
    assert(r.getDouble(2) === 2.0)
    assert(r.isNullAt(3) && r.isNullAt(4) && r.isNullAt(5))
    // NULL metric/covariate rows are excluded listwise
    val withNulls = Seq((Some(false), Some(1.0), Some(1.0)),
      (Some(false), Some(2.0), Some(2.0)), (Some(false), None, Some(9.0)),
      (Some(true), Some(3.0), None), (Some(true), Some(2.0), Some(1.0)),
      (Some(true), Some(4.0), Some(2.0))).toDF("v", "y", "x")
    val r2 = AbTest.cuped(withNulls, col("v"), col("y"), col("x")).head()
    assert((r2.getLong(0), r2.getLong(1)) === ((2L, 2L)))
  }

  test("diffInDiff recovers a planted effect under parallel trends") {
    // control: pre 10, post 12 (trend +2); treated: pre 20, post 25
    // (trend +2 plus effect +3). Small within-cell noise for variance.
    val rows = (0 until 40).flatMap { i =>
      val eps = (i % 4) * 0.01 // same noise pattern in every cell
      Seq((false, false, 10.0 + eps), (false, true, 12.0 + eps),
        (true, false, 20.0 + eps), (true, true, 25.0 + eps))
    }
    val r = AbTest.diffInDiff(rows.toDF("t", "p", "y"),
      col("t"), col("p"), col("y")).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ===
      ((40L, 40L, 40L, 40L)))
    assert(math.abs(r.getDouble(8) - 3.0) < 1e-9) // did
    assert(!r.isNullAt(9) && r.getDouble(10) > 50.0) // tiny SE, huge t
    // brute-force agreement on the point estimate
    def m(t: Boolean, p: Boolean) = {
      val c = rows.filter(x => x._1 == t && x._2 == p)
        .map(x => math.round(x._3 * 100))
      c.sum.toDouble / c.size / 100.0
    }
    val didBrute = (m(true, true) - m(true, false)) -
      (m(false, true) - m(false, false))
    assert(math.abs(r.getDouble(8) - math.rint(didBrute * 1e4) / 1e4) < 1e-12)
  }

  test("diffInDiff: empty cell nulls did; constant cells null se/t") {
    val noPost = Seq((false, false, 1.0), (true, false, 2.0))
    val r = AbTest.diffInDiff(noPost.toDF("t", "p", "y"),
      col("t"), col("p"), col("y")).head()
    assert(r.isNullAt(8) && r.isNullAt(9) && r.isNullAt(10))
    // all four cells present but single-row: variance undefined
    val ones = Seq((false, false, 1.0), (false, true, 2.0),
      (true, false, 3.0), (true, true, 5.0))
    val r2 = AbTest.diffInDiff(ones.toDF("t", "p", "y"),
      col("t"), col("p"), col("y")).head()
    assert(r2.getDouble(8) === 1.0) // (5-3)-(2-1)
    assert(r2.isNullAt(9) && r2.isNullAt(10))
  }

  test("diffInDiff: all-empty input reports zero counts, not NULL longs") {
    // the RankTest empty-input contract anovaF/srmCheck/ksTest follow:
    // getLong must not throw on an experiment with no qualifying rows
    val empty = Seq.empty[(Boolean, Boolean, Double)].toDF("t", "p", "y")
    val r = AbTest.diffInDiff(empty, col("t"), col("p"), col("y")).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ===
      ((0L, 0L, 0L, 0L)))
    assert(r.isNullAt(8) && r.isNullAt(9) && r.isNullAt(10))
  }

  test("powerMde matches the Fleiss formula; inverse-square in the MDE") {
    // 1000 users, 100 converted -> p1 = 0.1 exactly
    val users = (1 to 1000).map(i => (i.toLong, i <= 100)).toDF("u", "c")
    val r = AbTest.powerMde(users, col("c"), Seq(50000L, 200000L))
      .collect().map(x => x.getLong(0) -> x.getLong(4)).toMap
    def fleiss(p1: Double, mde: Double): Long = {
      val p2 = p1 * (1 + mde); val pb = (p1 + p2) / 2
      val e = 1.959964 * math.sqrt(2 * pb * (1 - pb)) +
        0.841621 * math.sqrt(p1 * (1 - p1) + p2 * (1 - p2))
      math.ceil((e * e) / ((p2 - p1) * (p2 - p1))).toLong
    }
    assert(r(50000L) === fleiss(0.1, 0.05))
    assert(r(200000L) === fleiss(0.1, 0.20))
    // halving the detectable lift ~quadruples the required sample
    assert(r(50000L) > 10 * r(200000L) && r(50000L) < 20 * r(200000L))
    // degenerate baselines refuse with NULL, not a crash
    val allConv = (1 to 10).map(i => (i.toLong, true)).toDF("u", "c")
    assert(AbTest.powerMde(allConv, col("c"), Seq(100000L))
      .collect().forall(_.isNullAt(4)))
    // a >100% relative lift on a low baseline is well-posed (p2 < 1)
    assert(AbTest.powerMde(users, col("c"), Seq(1500000L))
      .head().getLong(4) === fleiss(0.1, 1.5))
  }

  test("msprt: p_av is non-increasing, crushes under a planted effect, " +
    "and lambda matches the brute chain") {
    // 14 daily cohorts of 100+100 users converting SAME-DAY;
    // control converts 10%, treated 30%
    val rows = for (day <- 1 to 14; i <- 0 until 200) yield {
      val t = i % 2 == 1
      val idx = i / 2
      val d = java.sql.Date.valueOf(f"2024-01-$day%02d")
      val conv = if (t) idx < 30 else idx < 10
      (d, t, if (conv) Some(d) else None)
    }
    val r = AbTest.msprt(rows.toDF("d", "v", "cd"),
      col("v"), col("d"), col("cd")).collect()
    assert(r.length === 14)
    assert((r.head.getLong(1), r.head.getLong(2)) === ((100L, 10L)))
    assert((r.last.getLong(3), r.last.getLong(4)) === ((1400L, 420L)))
    // always-valid p = running min of 1/Λ: non-increasing by definition
    val ps = r.map(_.getDouble(6))
    assert(ps.zip(ps.tail).forall { case (a, b) => b <= a + 1e-12 })
    assert(ps.last < 0.01, s"planted 3x lift should be loud, p=${ps.last}")
    // day-1 lambda against the hand-computed mixture chain
    val (na, ca, nb, cb) = (100.0, 10.0, 100.0, 30.0)
    val pool = (ca + cb) / (na + nb)
    val v = pool * (1 - pool) * (1 / na + 1 / nb)
    val t2 = 1e-4
    val del = cb / nb - ca / na
    val lam = math.sqrt(v / (v + t2)) *
      math.exp(del * del * t2 / (2 * v * (v + t2)))
    assert(math.abs(r.head.getDouble(5) - math.rint(lam * 1e4) / 1e4) < 1e-9)
    // a null experiment never gets (spuriously) significant
    val nullRows = for (day <- 1 to 14; i <- 0 until 200) yield {
      val d = java.sql.Date.valueOf(f"2024-01-$day%02d")
      (d, i % 2 == 1, if (i / 2 < 20) Some(d) else None)
    }
    val pNull = AbTest.msprt(nullRows.toDF("d", "v", "cd"),
      col("v"), col("d"), col("cd")).collect().map(_.getDouble(6)).min
    assert(pNull > 0.5, s"null effect must keep p high, got $pNull")
  }

  test("msprt is filtration-adapted: a future conversion is invisible " +
    "at earlier looks") {
    val d1 = java.sql.Date.valueOf("2024-01-01")
    val d5 = java.sql.Date.valueOf("2024-01-05")
    // everyone enrolls day 1; every treated user converts on day 5 —
    // the day-1 look must see ZERO conversions (the ever-converted
    // shortcut would leak them all into it and invalidate the
    // guarantee). 1000/arm so the day-5 evidence clears the mixture
    // prior (at n=20 Λ is ~1.08 by hand — correctly conservative).
    val rows = (0 until 2000).map { i =>
      val t = i % 2 == 1
      (d1, t, if (t) Some(d5) else None)
    }
    val r = AbTest.msprt(rows.toDF("d", "v", "cd"),
      col("v"), col("d"), col("cd")).collect()
    assert(r.length === 2)
    assert((r(0).getLong(2), r(0).getLong(4)) === ((0L, 0L)))
    assert(r(0).isNullAt(5) && r(0).isNullAt(6)) // pooled rate 0: no test
    assert(r(1).getLong(4) === 1000L)
    assert(!r(1).isNullAt(6) && r(1).getDouble(6) < 0.01)
  }

  test("anovaF agrees with brute-force F; planted separation is loud") {
    val rnd = new scala.util.Random(13)
    // three groups with distinct means and shared spread
    val rows = Seq("a", "b", "c").flatMap { g =>
      val base = g(0) - 'a'
      Seq.fill(60)((g, base * 2.0 + rnd.nextInt(5) / 10.0))
    }
    val r = AbTest.anovaF(rows.toDF("g", "y"), col("g"), col("y")).head()
    assert((r.getLong(0), r.getLong(1)) === ((3L, 180L)))
    assert((r.getLong(3), r.getLong(4)) === ((2L, 177L)))
    // brute force over the same quantized integers
    val q = rows.map { case (g, y) => (g, math.round(y * 100)) }
    val n = q.size.toDouble
    val grand = q.map(_._2).sum.toDouble
    val b = q.groupBy(_._1).values
      .map(c => { val s = c.map(_._2).sum.toDouble; s * s / c.size }).sum
    val qq = q.map(x => x._2.toDouble * x._2).sum
    val fBrute = ((b - grand * grand / n) / 2.0) / ((qq - b) / 177.0)
    assert(math.abs(r.getDouble(2) - fBrute) < 1e-3)
    assert(r.getDouble(2) > 1000.0) // the planted separation is huge
  }

  test("anovaF degeneracies: k < 2, constant groups, empty input") {
    val oneGroup = Seq(("a", 1.0), ("a", 2.0)).toDF("g", "y")
    assert(AbTest.anovaF(oneGroup, col("g"), col("y")).head().isNullAt(2))
    // all values identical: SSW = 0, F undefined
    val const = Seq(("a", 5.0), ("a", 5.0), ("b", 5.0), ("b", 5.0))
      .toDF("g", "y")
    val rc = AbTest.anovaF(const, col("g"), col("y")).head()
    assert(rc.getLong(0) === 2L && rc.isNullAt(2))
    val empty = Seq((Option.empty[String], Option.empty[Double]))
      .toDF("g", "y")
    val re = AbTest.anovaF(empty, col("g"), col("y")).head()
    // zero counts, not NULL longs (the RankTest empty-input contract)
    assert((re.getLong(0), re.getLong(1)) === ((0L, 0L)))
    assert(re.isNullAt(2) && re.isNullAt(3))
  }

  test("srmCheck: healthy split passes, broken split flags, brute χ²") {
    val ok = (1 to 1000).map(i => Tuple1(i % 2 == 1)).toDF("v")
    val r = AbTest.srmCheck(ok, col("v")).head()
    assert((r.getLong(0), r.getLong(1)) === ((500L, 500L)))
    assert(r.getDouble(3) === 0.0 && !r.getBoolean(4))
    // 600/400 against an intended 50/50: chi2 = 2*(100^2/500) = 40
    val broken = ((1 to 600).map(_ => true) ++ (1 to 400).map(_ => false))
      .map(Tuple1(_)).toDF("v")
    val rb = AbTest.srmCheck(broken, col("v")).head()
    assert(rb.getDouble(3) === 40.0 && rb.getBoolean(4))
    // asymmetric expected split: 300/700 at 70% B expected is healthy
    val skewed = ((1 to 700).map(_ => true) ++ (1 to 300).map(_ => false))
      .map(Tuple1(_)).toDF("v")
    val rs = AbTest.srmCheck(skewed, col("v"), expectedBppm = 700000L)
      .head()
    assert(rs.getDouble(3) === 0.0 && !rs.getBoolean(4))
    // empty input: zero counts, NULL chi2/flag
    val empty = Seq(Tuple1(Option.empty[Boolean])).toDF("v")
    val re = AbTest.srmCheck(empty, col("v")).head()
    assert((re.getLong(0), re.getLong(1)) === ((0L, 0L)))
    assert(re.isNullAt(3) && re.isNullAt(4))
  }

  test("Welch moment sums stay exact when squares exceed the long sum range") {
    // values ~3e7 in quant units (3e5 * 100): q^2 ~ 9e14; 10.5k rows
    // per arm sum to ~9.5e18, past a naive long sum-of-squares at
    // 9.2e18 -- the hi/lo split keeps both partial sums small and exact
    val big = (1 to 21000).map(i => (i % 2 == 1, 300000.0 + (i % 7)))
    val r = AbTest.welchTTest(big.toDF("v", "x"), col("v"), col("x")).head()
    assert(r.getLong(0) === 10500L && r.getLong(1) === 10500L)
    assert(!r.isNullAt(4) && !r.isNullAt(5))
    assert(math.abs(r.getDouble(2) - 300003.0) < 1.0)
  }
}
