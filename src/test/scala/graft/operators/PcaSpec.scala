package graft.operators

import graft.SparkSpec

class PcaSpec extends SparkSpec {
  import spark.implicits._

  private def toDf(rows: Seq[Array[Float]]) =
    rows.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "vec")

  test("fit recovers the dominant axis of stretched data") {
    // points along (1, 1, 0)/√2 with tiny off-axis jitter
    val dirV = Array(1.0, 1.0, 0.0).map(_ / math.sqrt(2))
    val rows = (-20 to 20).map { t =>
      Array((t * dirV(0) + 0.01 * (t % 3)).toFloat,
        (t * dirV(1) - 0.01 * (t % 3)).toFloat,
        (0.02 * (t % 5)).toFloat)
    }
    val m = Pca.fit(toDf(rows), "vec", d = 3, nComp = 2)
    val c0 = m.comps(0)
    val cosine = math.abs(c0.zip(dirV).map { case (a, b) => a * b }.sum)
    assert(cosine > 0.999, s"c0 = ${c0.toSeq}")
  }

  test("components are unit-norm, orthogonal, sign-canonical") {
    val rnd = new scala.util.Random(7)
    val rows = (1 to 200).map(_ =>
      Array.fill(8)((rnd.nextGaussian() * (rnd.nextInt(3) + 1)).toFloat))
    val m = Pca.fit(toDf(rows), "vec", d = 8, nComp = 3)
    for (c <- m.comps) {
      assert(math.abs(c.map(x => x * x).sum - 1.0) < 1e-9)
      val pivot = c.indices.maxBy(i => (math.abs(c(i)), -i))
      assert(c(pivot) > 0, "canonical sign")
    }
    for (Seq(a, b) <- m.comps.toSeq.combinations(2)) {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      assert(math.abs(dot) < 1e-6, s"dot = $dot")
    }
  }

  test("first component maximizes projected variance") {
    val rnd = new scala.util.Random(11)
    val rows = (1 to 300).map { _ =>
      val t = rnd.nextGaussian() * 10 // dominant direction e0+e3
      Array((t + rnd.nextGaussian()).toFloat, rnd.nextGaussian().toFloat,
        rnd.nextGaussian().toFloat, (t - rnd.nextGaussian()).toFloat)
    }
    val m = Pca.fit(toDf(rows), "vec", d = 4, nComp = 2)
    val proj = Pca.projectExact(toDf(rows), "id", "vec", m)
      .select("p0", "p1").collect()
      .map(r => (r.getLong(0).toDouble, r.getLong(1).toDouble))
    def variance(xs: Seq[Double]) = {
      val mu = xs.sum / xs.size
      xs.map(x => (x - mu) * (x - mu)).sum / (xs.size - 1)
    }
    assert(variance(proj.map(_._1).toSeq) > variance(proj.map(_._2).toSeq))
  }

  test("fit is deterministic and projections are exact integers") {
    val rows = (1 to 50).map(i =>
      Array.tabulate(6)(j => ((i * (j + 1)) % 17 - 8).toFloat))
    val m1 = Pca.fit(toDf(rows), "vec", d = 6, nComp = 2)
    val m2 = Pca.fit(toDf(rows), "vec", d = 6, nComp = 2)
    assert(m1.mean.toSeq === m2.mean.toSeq)
    assert(m1.comps.map(_.toSeq).toSeq === m2.comps.map(_.toSeq).toSeq)
    val p1 = Pca.projectExact(toDf(rows), "id", "vec", m1)
      .orderBy("id").collect().map(r => (r.getLong(1), r.getLong(2)))
    val p2 = Pca.projectExact(toDf(rows), "id", "vec", m2)
      .orderBy("id").collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(p1.toSeq === p2.toSeq)
  }

  test("fixtureTable carries the quantized model, one row per dim") {
    val rows = (1 to 30).map(i => Array.tabulate(4)(j =>
      (math.sin(i * (j + 1)) * 5).toFloat))
    val m = Pca.fit(toDf(rows), "vec", d = 4, nComp = 2)
    val f = Pca.fixtureTable(spark, m).orderBy("i").collect()
    assert(f.length === 4)
    assert(f.map(_.getLong(1)).toSeq ===
      m.mean.map(x => math.round(x * 10000)).toSeq)
    assert(f.map(_.getLong(2)).toSeq ===
      m.comps(0).map(x => math.round(x * 1000000)).toSeq)
  }
}
