package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.KmvAgg

class KmvSketchSpec extends SparkSpec {

  test("KmvAgg keeps the k smallest DISTINCT values, sorted") {
    val agg = new KmvAgg(4)
    // duplicates never enter; saturation ejects the largest
    val buf = Seq(9L, 3L, 9L, 7L, 1L, 5L, 3L, 2L)
      .foldLeft(agg.zero)(agg.reduce)
    assert(buf.toSeq === Seq(1L, 2L, 3L, 5L))
    // merge is the same bounded sorted-distinct union
    assert(agg.merge(Array(1L, 4L, 8L), Array(2L, 4L, 6L)).toSeq ===
      Seq(1L, 2L, 4L, 6L))
    // order-independence: reversed arrival, same sketch
    val rev = Seq(9L, 3L, 9L, 7L, 1L, 5L, 3L, 2L).reverse
      .foldLeft(agg.zero)(agg.reduce)
    assert(rev.toSeq === buf.toSeq)
  }

  test("unsaturated sketch is the exact value set; estimate is exact") {
    import spark.implicits._
    val df = (1 to 40).map(i => (i % 10).toLong).toDF("v")
    val sk = KmvSketch.sketchBy(df, col("v"), 256, lit("_all"))
      .select("minima")
    val Array(row) = KmvSketch.estimate(sk, 256).collect()
    assert(row.getLong(0) === 10L) // n_min == distinct count
    assert(row.getDouble(1) === 10.0) // exact regime
  }

  test("merged shard sketches equal the full-scan sketch bit-for-bit") {
    import spark.implicits._
    val df = (1 to 3000).map(i => ((i % 7).toString, (i % 800).toLong))
      .toDF("shard", "v")
    val k = 64
    val merged = KmvSketch.merge(
      KmvSketch.sketchBy(df, col("v"), k, col("shard")), k)
      .collect()(0).getSeq[Long](0)
    val full = KmvSketch.sketchBy(df, col("v"), k, lit("_all"))
      .collect()(0).getSeq[Long](1)
    assert(merged === full)
    assert(merged.length === k)
    assert(merged === merged.sorted && merged.distinct === merged)
  }

  test("intersection estimate is exact when the union sketch is unsaturated") {
    import spark.implicits._
    // A = 0..59, B = 40..99 -> |A ∩ B| = 20, |A ∪ B| = 100 < k
    val k = 256
    val a = KmvSketch.sketchBy((0L to 59L).toDF("v"), col("v"), k,
      lit("a")).select("minima")
    val b = KmvSketch.sketchBy((40L to 99L).toDF("v"), col("v"), k,
      lit("b")).select("minima")
    val Array(row) = KmvSketch.estimateIntersection(a, b, k).collect()
    assert(row.getLong(0) === 100L) // n_union_min
    assert(row.getLong(1) === 20L) // rho_num
    assert(row.getDouble(2) === 100.0) // est_union exact
    assert(row.getDouble(3) === 20.0) // est_intersect exact
  }

  test("difference estimate is exact when both sketches are unsaturated") {
    import spark.implicits._
    // A = 0..59, B = 40..99 -> |A−B| = 40, |B−A| = 40, |A∩B| = 20
    val k = 256
    val a = KmvSketch.sketchBy((0L to 59L).toDF("v"), col("v"), k,
      lit("a")).select("minima")
    val b = KmvSketch.sketchBy((40L to 99L).toDF("v"), col("v"), k,
      lit("b")).select("minima")
    val Array(row) = KmvSketch.estimateDifference(a, b, k).collect()
    assert(row.getLong(0) === 60L) // n_a_min
    assert(row.getLong(1) === 60L) // n_b_min
    assert(row.getLong(2) === 100L) // n_union_min
    assert(row.getLong(3) === 20L) // rho_num
    assert(row.getDouble(4) === 60.0) // est_a exact
    assert(row.getDouble(5) === 60.0) // est_b exact
    assert(row.getDouble(6) === 20.0) // est_intersect exact
    assert(row.getDouble(7) === 40.0) // est_diff_ab exact
    assert(row.getDouble(8) === 40.0) // est_diff_ba exact
  }

  test("difference estimate: disjoint sets, subset sets, and the 0-clamp") {
    import spark.implicits._
    val k = 256
    def sk(r: Range) = KmvSketch.sketchBy(
      r.map(_.toLong).toDF("v"), col("v"), k, lit("s")).select("minima")
    // disjoint: intersection 0, differences are the full sets
    val Array(d) = KmvSketch.estimateDifference(sk(0 to 49), sk(50 to 99), k)
      .collect()
    assert(d.getDouble(6) === 0.0 && d.getDouble(7) === 50.0 &&
      d.getDouble(8) === 50.0)
    // A ⊂ B: |A−B| = 0 (the clamp floor is also the true answer)
    val Array(s) = KmvSketch.estimateDifference(sk(0 to 19), sk(0 to 99), k)
      .collect()
    assert(s.getDouble(7) === 0.0 && s.getDouble(8) === 80.0)
  }

  test("two EMPTY sketches estimate 0.0 everywhere, never NaN") {
    import spark.implicits._
    // an empty month range reaches the estimators through merge()
    // (sketchBy groups away to ZERO rows; merge's ungrouped agg always
    // emits one row with an empty minima array — the q49 shape for a
    // filter that matches no shard). The rho estimator's 0·0/0 was NaN
    // in Spark (and NULL in DuckDB — a cross-engine drift) before the
    // empty-union guard
    val k = 16
    def empty = KmvSketch.merge(KmvSketch.sketchBy(
      Seq.empty[Long].toDF("v"), col("v"), k, lit("s")), k)
    val Array(d) = KmvSketch.estimateDifference(empty, empty, k).collect()
    assert((d.getLong(0), d.getLong(1), d.getLong(2), d.getLong(3)) ===
      ((0L, 0L, 0L, 0L)))
    (4 to 8).foreach { i =>
      assert(d.getDouble(i) === 0.0, s"col $i should be 0.0, not NaN")
    }
    val Array(ix) = KmvSketch.estimateIntersection(empty, empty, k)
      .collect()
    assert(ix.getDouble(2) === 0.0 && ix.getDouble(3) === 0.0)
  }

  test("saturated difference estimator lands near the true churn") {
    import spark.implicits._
    // |A| = |B| = 4000, overlap 2000: saturated sketches, error ~1/√k
    val k = 256
    val a = KmvSketch.sketchBy((1L to 4000L).toDF("v"), col("v"), k,
      lit("a")).select("minima")
    val b = KmvSketch.sketchBy((2001L to 6000L).toDF("v"), col("v"), k,
      lit("b")).select("minima")
    val Array(row) = KmvSketch.estimateDifference(a, b, k).collect()
    val (da, db) = (row.getDouble(7), row.getDouble(8))
    assert(da > 1200 && da < 2800, s"est_diff_ab $da too far from 2000")
    assert(db > 1200 && db < 2800, s"est_diff_ba $db too far from 2000")
  }

  test("saturated estimator lands near the true cardinality") {
    import spark.implicits._
    // 5000 distinct values, k=256: KMV relative error ~1/sqrt(k-2) ≈ 6%;
    // md5 is fixed, so the measured estimate is deterministic — assert
    // the 3-sigma envelope it must (and does) fall in
    val df = (1L to 5000L).toDF("v")
    val sk = KmvSketch.sketchBy(df, col("v"), 256, lit("_all"))
      .select("minima")
    val Array(row) = KmvSketch.estimate(sk, 256).collect()
    assert(row.getLong(0) === 256L)
    val est = row.getDouble(1)
    assert(est > 4100 && est < 5900, s"estimate $est too far from 5000")
  }
}
