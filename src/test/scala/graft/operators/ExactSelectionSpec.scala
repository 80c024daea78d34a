package graft.operators

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ExactSelectionSpec extends SparkSpec {
  import spark.implicits._

  test("kthSmallest == sorted reference on random data incl. duplicates") {
    val rnd = new Random(19)
    (1 to 3).foreach { round =>
      // heavy duplication + wide range + negatives
      val data = (1 to 5000).map(_ => rnd.nextInt(200).toLong - 100) ++
        (1 to 500).map(_ => rnd.nextLong() % 1000000000L)
      val df = data.toDF("x").repartition(7)
      val sorted = data.sorted
      for (k <- Seq(1L, 17L, data.size / 2L, data.size.toLong)) {
        val got = ExactSelection.kthSmallest(df, "x", k, buckets = 64)
        assert(got === sorted((k - 1).toInt), s"round $round k=$k")
      }
    }
  }

  test("kthSmallest: small buckets force multiple narrowing rounds") {
    val data = (1L to 100000L).map(i => i * 977L % 1000003L)
    val sorted = data.sorted
    val df = data.toDF("x")
    // buckets=16 over span ~10^6 → ~5 rounds of narrowing
    assert(ExactSelection.kthSmallest(df, "x", 31337L, buckets = 16) ===
      sorted(31336))
  }

  test("quantiles: ceil(q*n) definition matches row_number formulation") {
    val data = (1 to 999).map(_.toLong)
    val df = data.toDF("x")
    val got = ExactSelection.quantiles(df, "x", Seq(0.25, 0.5, 0.9, 1.0))
      .collect().map(r => (r.getDouble(0), r.getLong(1), r.getLong(2)))
    got.foreach { case (q, k, v) =>
      assert(k === math.max(1L, math.ceil(q * 999).toLong))
      assert(v === k) // data IS 1..999 so kth smallest == k
    }
  }

  test("nulls are ignored; k out of range rejected") {
    val df = Seq[java.lang.Long](5L, null, 1L, null, 3L).toDF("x")
    assert(ExactSelection.kthSmallest(df, "x", 2) === 3L)
    intercept[IllegalArgumentException] {
      ExactSelection.kthSmallest(df, "x", 4)
    }
  }

  test("level-synchronized: scan count is independent of quantile count") {
    def scansFor(nQs: Int): Long = {
      val acc = spark.sparkContext.longAccumulator("scans")
      val base = spark.range(0, 100000, 1, 4)
        .mapPartitions { it => acc.add(1); it.map(i => (i * 31) % 65536) }
        .toDF("x")
      val qs = (1 to nQs).map(i => i.toDouble / (nQs + 1))
      ExactSelection.quantiles(base, "x", qs, buckets = 256).collect()
      acc.value
    }
    val one = scansFor(1)
    val five = scansFor(5)
    // the up-front localCheckpoint is the ONLY pass over the source
    // (4 partitions); stats, the shared levels, and the terminal walk
    // all read the materialized longs — multi-pass selection touches
    // the source format exactly once
    assert(one === 4L, s"single-quantile source scans: $one")
    assert(five === one,
      s"5 quantiles took $five partition scans vs $one for 1 — " +
        "level synchronization broke")
  }

  test("quantiles: duplicates and repeated q values resolve exactly") {
    val data = Seq.fill(400)(7L) ++ Seq.fill(300)(42L) ++ Seq.fill(300)(9999L)
    val df = scala.util.Random.shuffle(data).toDF("x")
    val got = ExactSelection.quantiles(df, "x", Seq(0.1, 0.4, 0.4, 0.7, 1.0),
        buckets = 16)
      .collect().map(r => (r.getDouble(0), r.getLong(2))).toMap
    assert(got(0.1) === 7L)   // k=100 within the 400 sevens
    assert(got(0.4) === 7L)   // k=400 still a seven
    assert(got(0.7) === 42L)  // k=700 in the 42s
    assert(got(1.0) === 9999L)
  }
}
