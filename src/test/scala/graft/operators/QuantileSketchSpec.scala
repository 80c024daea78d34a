package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class QuantileSketchSpec extends SparkSpec {
  import spark.implicits._

  test("k >= n: the sketch IS the sorted data and quantiles are exact") {
    val df = Seq(5L, 1L, 9L, 3L, 7L).toDF("v")
      .withColumn("s", lit("only"))
    val sk = QuantileSketch.build(df, "v", col("s"), k = 8)
    val pts = sk.orderBy("v").collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(pts === Array((1L, 1L), (3L, 1L), (5L, 1L), (7L, 1L), (9L, 1L)))
    val q = QuantileSketch.quantiles(QuantileSketch.mergeAll(sk, 8),
      Seq(20, 40, 60, 80, 100)).orderBy("pct").collect()
      .map(r => r.getInt(0) -> r.getLong(3)).toMap
    // targets ceil(p*5/100) = 1..5 -> exact order statistics
    assert(q === Map(20 -> 1L, 40 -> 3L, 60 -> 5L, 80 -> 7L, 100 -> 9L))
  }

  test("build plans ONE data-sized Window pass (r, n and the lag share " +
    "a single spec; the old bare-partitionBy count was a second one)") {
    val df = (1L to 100L).toDF("v").withColumn("s", lit("a"))
    val plan = QuantileSketch.build(df, "v", col("s"), k = 8)
      .queryExecution.executedPlan.toString
    val winLines = plan.linesIterator.filter { l =>
      val t = l.trim
      t.startsWith("+- Window") || t.startsWith("Window")
    }.toSeq
    // two Window nodes total: the data-sized one computing BOTH
    // row_number and count over one sort, and the lag over the
    // already-filtered anchor frame (<= k rows per shard)
    assert(winLines.size <= 2, plan)
    assert(winLines.exists(l =>
      l.contains("row_number") && l.contains("count(1)")), plan)
  }

  test("mergeAllBy/quantilesBy equal the ungrouped path group by group") {
    val rnd = new scala.util.Random(7)
    val k = 8
    val data = Seq("g1" -> 120, "g2" -> 35, "g3" -> 6).flatMap {
      case (g, n) => (1 to n).map(i =>
        (g, s"$g-s${i % 3}", rnd.nextInt(500).toLong))
    }
    val sk = QuantileSketch.build(
      data.toDF("g", "s", "v"), "v", col("s"), k)
      .withColumn("grp", substring(col("shard"), 1, 2))
    val grouped = QuantileSketch.mergeAllBy(sk, col("grp"), k)
    val reads = QuantileSketch.quantilesBy(grouped, Seq(25, 50, 99))
      .collect().map(r => (r.getString(0), r.getInt(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    for (g <- Seq("g1", "g2", "g3")) {
      val solo = QuantileSketch.mergeAll(
        sk.filter(col("grp") === g), k)
      val gRows = grouped.filter(col("grp") === g)
        .select("v", "w", "cum").orderBy("cum").collect().toSeq
      assert(gRows === solo.orderBy("cum").collect().toSeq, g)
      val soloReads = QuantileSketch.quantiles(solo, Seq(25, 50, 99))
        .collect().map(r => (g, r.getInt(0)) ->
          (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
      soloReads.foreach { case (key, v) => assert(reads(key) === v, key) }
    }
  }

  test("build: anchors at exact ranks ceil(i*n/k), weights sum to n") {
    val df = (1L to 10L).toDF("v").withColumn("s", lit("a"))
    val sk = QuantileSketch.build(df, "v", col("s"), k = 4)
      .orderBy("v").collect().map(r => (r.getLong(1), r.getLong(2)))
    // ceil(i*10/4) = 3,5,8,10 with gaps 3,2,3,2
    assert(sk === Array((3L, 3L), (5L, 2L), (8L, 3L), (10L, 2L)))
  }

  test("rank-error envelope holds; merge order never changes readouts") {
    val rnd = new scala.util.Random(42)
    val k = 16
    // three shards of different sizes and shifted ranges (drifting
    // domain), duplicates included
    val data = Seq("a" -> 400, "b" -> 150, "c" -> 37).flatMap {
      case (s, n) => Seq.fill(n)((s, rnd.nextInt(1000).toLong +
        (if (s == "c") 5000L else 0L)))
    }
    val df = data.toDF("s", "v")
    val sk = QuantileSketch.build(df, "v", col("s"), k)
    // per-shard: <= k points, weights sum to n_s
    val byShard = sk.groupBy("shard")
      .agg(count(lit(1)).as("pts"), sum("w").as("n"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(byShard("a") === ((16L, 400L)))
    assert(byShard("b") === ((16L, 150L)))
    assert(byShard("c") === ((16L, 37L)))

    val sorted = data.map(_._2).sorted
    val n = sorted.length
    val eps = Seq(400, 150, 37).map(ns => (ns + k - 1) / k).sum +
      (n + k - 1) / k
    def check(est: Long, target: Long): Unit = {
      val lo = sorted.count(_ < est) // ranks (lo, hi] hold value est
      val hi = sorted.count(_ <= est)
      assert(lo < target + eps && hi >= target - eps,
        s"est $est target $target ranks ($lo,$hi] eps $eps")
    }
    val merged = QuantileSketch.mergeAll(sk, k)
    val q = QuantileSketch.quantiles(merged, Seq(1, 10, 25, 50, 75, 90, 99))
      .collect().map(r => (r.getLong(2), r.getLong(3)))
    assert(q.length === 7)
    q.foreach { case (target, est) => check(est, target) }

    // merge-order independence: shuffled sketch rows -> identical
    // merged points and readouts (the state is a multiset function)
    val shuffled = sk.orderBy(expr("xxhash64(v, w, shard)"))
    val m2 = QuantileSketch.mergeAll(shuffled, k)
    assert(m2.orderBy("cum").collect().toSeq ===
      merged.orderBy("cum").collect().toSeq)

    // two-level merge tree (shards -> pair -> all) stays inside the
    // envelope with one extra recompression term
    val ab = QuantileSketch.mergeAll(sk.filter(col("shard") =!= "c"), k)
    val twoLevel = QuantileSketch.mergeAll(
      ab.select(col("v"), col("w"))
        .unionByName(sk.filter(col("shard") === "c").select("v", "w")), k)
    val eps2 = eps + (n + k - 1) / k
    QuantileSketch.quantiles(twoLevel, Seq(10, 50, 90)).collect()
      .foreach { r =>
        val (target, est) = (r.getLong(2), r.getLong(3))
        val lo = sorted.count(_ < est)
        val hi = sorted.count(_ <= est)
        assert(lo < target + eps2 && hi >= target - eps2,
          s"2-level est $est target $target ranks ($lo,$hi] eps $eps2")
      }
  }

  test("groupQuantiles: per-group readout inside the tightened envelope," +
      " exact when k >= shard sizes") {
    val rnd = new scala.util.Random(31)
    val rows = for {
      g <- Seq("svc_a", "svc_b"); d <- 0 until 4; _ <- 0 until 50
    } yield (g, s"$g:$d", rnd.nextInt(1000).toLong)
    val df = rows.toDF("g", "shard", "v")
    val k = 8
    val sk = QuantileSketch.build(df, "v", col("shard"), k)
      .join(df.select("g", "shard").distinct(), "shard")
    val got = QuantileSketch.groupQuantiles(sk, col("g"), Seq(50, 95))
      .collect().map(r => (r.getString(0), r.getInt(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    for (g <- Seq("svc_a", "svc_b"); pct <- Seq(50, 95)) {
      val vals = rows.filter(_._1 == g).map(_._3).sorted
      val n = vals.size.toLong
      val (gn, target, est) = got((g, pct))
      assert(gn === n)
      assert(target === (pct * n + 99) / 100)
      // tightened envelope: eps = sum of per-shard ceil(n_s/k), no
      // recompression term
      val eps = (0 until 4).map(d => (50L + k - 1) / k).sum
      val lo = vals.count(_ < est)
      val hi = vals.count(_ <= est)
      assert(lo < target + eps && hi >= target - eps,
        s"$g p$pct est $est target $target ranks ($lo,$hi] eps $eps")
    }
    // k >= shard size: sketch is the full multiset, readout is EXACT
    val kBig = QuantileSketch.build(df, "v", col("shard"), 64)
      .join(df.select("g", "shard").distinct(), "shard")
    QuantileSketch.groupQuantiles(kBig, col("g"), Seq(50)).collect()
      .foreach { r =>
        val vals = rows.filter(_._1 == r.getString(0)).map(_._3).sorted
        assert(r.getLong(4) === vals((r.getLong(3) - 1).toInt))
      }
  }

  test("empty input and k > N degeneracies") {
    val empty = Seq.empty[(String, Long)].toDF("s", "v")
    assert(QuantileSketch.build(empty, "v", col("s"), 4).count() === 0)
    assert(QuantileSketch.mergeAll(
      QuantileSketch.build(empty, "v", col("s"), 4), 4).count() === 0)
    // k=8 > N=3: merged sketch collapses to the 3 real points
    val tiny = Seq(("a", 2L), ("a", 1L), ("b", 3L)).toDF("s", "v")
    val m = QuantileSketch.mergeAll(
      QuantileSketch.build(tiny, "v", col("s"), 8), 8)
      .orderBy("v").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(m === Array((1L, 1L), (2L, 1L), (3L, 1L)))
  }
}
