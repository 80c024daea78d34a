package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CountMinSpec extends SparkSpec {
  import spark.implicits._

  private def freqs(n: Int) =
    (1 to n).map(i => (i % 17).toLong).toDF("k")

  test("estimate never undercounts, and is exact when width >> keys") {
    val df = freqs(500) // 17 keys, counts 29 or 30
    val sk = CountMin.sketch(df, col("k"), depth = 4, width = 1024)
    val exact = df.groupBy("k").agg(count(lit(1)).as("exact"))
      .select(col("k").cast("string").as("ek"), col("exact"))
    val got = CountMin.estimate(sk, df.select("k").distinct(), "k")
      .join(exact, col("k") === col("ek"))
      .select(col("est"), col("exact")).collect()
    got.foreach { r =>
      assert(r.getLong(0) >= r.getLong(1)) // one-sided error
    }
    // 17 keys in 4x1024 buckets: no collisions, all exact
    assert(got.forall(r => r.getLong(0) == r.getLong(1)))
  }

  test("narrow sketch overcounts colliding keys but never undercounts") {
    val df = (1 to 1000).map(i => (i % 100).toLong).toDF("k")
    val sk = CountMin.sketch(df, col("k"), depth = 2, width = 8)
    val est = CountMin.estimate(sk, df.select("k").distinct(), "k",
      depth = 2, width = 8)
      .select("est").as[Long].collect()
    assert(est.forall(_ >= 10L)) // every key occurs 10 times
    assert(est.exists(_ > 10L))  // 100 keys in 8 buckets MUST collide
  }

  test("sketch size is bounded by depth x width regardless of input") {
    val sk = CountMin.sketch(freqs(5000), col("k"), depth = 3, width = 4)
    assert(sk.count() <= 12)
  }

  test("innerProduct never undercounts the join size, exact when sparse") {
    val a = (1 to 300).map(i => (i % 13).toLong).toDF("k")
    val b = (1 to 200).map(i => (i % 7).toLong).toDF("k")
    // exact |A join B| = sum over keys of cA(k)*cB(k)
    val exact = (0L until 13L).map { k =>
      (1 to 300).count(_ % 13 == k).toLong *
        (1 to 200).count(i => (i % 7).toLong == k)
    }.sum
    val est = CountMin.innerProduct(
      CountMin.sketch(a, col("k")), CountMin.sketch(b, col("k")))
      .head().getDecimal(0).longValueExact()
    // 13 + 7 keys in 4x1024 buckets: collision-free, exact
    assert(est === exact)
    // narrow sketch: collisions only ADD phantom products
    val estNarrow = CountMin.innerProduct(
      CountMin.sketch(a, col("k"), depth = 2, width = 4),
      CountMin.sketch(b, col("k"), depth = 2, width = 4))
      .head().getDecimal(0).longValueExact()
    assert(estNarrow >= exact)
  }

  test("innerProduct: disjoint and empty sketches estimate zero") {
    val a = (1 to 50).map(i => s"a$i").toDF("k")
    val b = (1 to 50).map(i => s"b$i").toDF("k")
    // wide sketch: a's and b's keys land in (almost surely) disjoint
    // buckets on at least one depth row — that row proves size 0, so
    // the min must be 0 (the inner-join version dropped the row and
    // inflated the estimate from the colliding rows instead)
    val est = CountMin.innerProduct(
      CountMin.sketch(a, col("k"), depth = 4, width = 65536),
      CountMin.sketch(b, col("k"), depth = 4, width = 65536))
      .head().getDecimal(0).longValueExact()
    assert(est === 0L)
    // empty sketch (empty input): join size 0, not NULL
    val empty = Seq.empty[String].toDF("k")
    val estE = CountMin.innerProduct(
      CountMin.sketch(empty, col("k")), CountMin.sketch(b, col("k")))
      .head().getDecimal(0).longValueExact()
    assert(estE === 0L)
  }

  test("merged shard sketches == sketch of the union") {
    val a = freqs(300)
    val b = (301 to 500).map(i => (i % 17).toLong).toDF("k")
    val merged = CountMin.merge(Seq(
      CountMin.sketch(a, col("k")), CountMin.sketch(b, col("k"))))
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val whole = CountMin.sketch(a.unionByName(b), col("k"))
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(merged === whole)
  }

  test("unknown keys estimate to zero (or collision noise), never error") {
    val sk = CountMin.sketch(freqs(100), col("k"), depth = 4, width = 1024)
    val est = CountMin.estimate(sk,
      Seq(99999L).toDF("k"), "k").select("est").as[Long].collect().head
    assert(est === 0L) // wide sketch: the absent key probes empty buckets
  }
}
