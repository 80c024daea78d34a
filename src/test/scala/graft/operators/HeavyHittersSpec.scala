package graft.operators

import scala.util.Random

import graft.SparkSpec

class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  test("misraGries: never misses a key above the guarantee line") {
    val rnd = new Random(7)
    (1 to 5).foreach { _ =>
      // skewed stream: a few hot keys + uniform noise
      val hot = Seq.fill(400)(1L) ++ Seq.fill(300)(2L) ++ Seq.fill(150)(3L)
      val noise = Seq.fill(1000)(rnd.nextInt(500).toLong + 100L)
      val stream = rnd.shuffle(hot ++ noise)
      val m = 20
      val survivors = HeavyHitters.misraGries(stream.iterator, m).toSet
      val exact = stream.groupBy(identity).map { case (k, v) => k -> v.size }
      val mustSurvive = exact.collect {
        case (k, c) if c > stream.size / (m + 1) => k
      }
      assert(mustSurvive.toSet.subsetOf(survivors),
        s"missed ${mustSurvive.toSet -- survivors}")
      // bounded state: at most m survivors
      assert(survivors.size <= m)
    }
  }

  test("heavyHitters: exact keys and counts vs a plain groupBy") {
    val rnd = new Random(11)
    val data = (Seq.fill(500)(42L) ++ Seq.fill(260)(7L) ++
      (1 to 2000).map(_ => rnd.nextInt(300).toLong + 1000L))
    val df = rnd.shuffle(data).toDF("k").repartition(8)
    val support = 0.08 // threshold = ceil(0.08 * 2760) = 221
    val got = HeavyHitters.heavyHitters(df, "k", support)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val n = data.size
    val t = math.ceil(support * n).toLong
    val exact = data.groupBy(identity)
      .collect { case (k, v) if v.size >= t => (k, v.size.toLong) }.toSet
    assert(got === exact)
    assert(got.map(_._1) === Set(42L, 7L))
  }

  test("heavyHitters: empty result when nothing qualifies") {
    val df = (1L to 1000L).toDF("k")
    assert(HeavyHitters.heavyHitters(df, "k", 0.5).count() === 0L)
  }

  test("heavyHitters: exactly two passes over the input") {
    // an accumulator bumped once per input-partition computation counts
    // scans directly — the fused summary pass + the exact-count pass
    // must touch each of the 6 partitions exactly twice
    val acc = spark.sparkContext.longAccumulator("inputScans")
    val base = spark.range(0, 3000, 1, 6).as[Long]
      .mapPartitions { it => acc.add(1); it.map(_ % 50) }
      .toDF("k")
    HeavyHitters.heavyHitters(base, "k", 0.02).collect()
    assert(acc.value === 12L, s"expected 2 passes x 6 partitions, got ${acc.value}")
  }
}
