package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PCA by covariance + power iteration (Pearson 1901; power method per
  * Golub & Van Loan) — the decorrelating rotation before whitening,
  * visualization, or cheap dimensionality reduction of an embedding
  * column.
  *
  * Scale shape: ONE pass computes count, per-dim sums, and the raw
  * d×d Gramian via per-partition accumulation (mapPartitions folding
  * rows into local double arrays — the treeAggregate discipline; the
  * only rows shuffled are one (1 + d + d²)-double summary PER
  * PARTITION). Covariance, eigenvectors, and quantization happen
  * driver-side on the d×d matrix — a bounded rider like k-means'
  * centroids (d = 64 here; the d×d fold is fine to ~1e4 dims, which is
  * past any embedding column). Projection is a shuffle-free map.
  *
  * Determinism: partition fold order is fixed by the input layout, the
  * cross-partition reduce folds in partition-index order, power
  * iteration starts from a FIXED basis vector and runs a FIXED
  * iteration count, and each component's sign is canonicalized
  * (largest-|coordinate| positive, lowest index on ties) — same input,
  * same model, no RNG anywhere.
  *
  * Exactness at the gate: the model ships as 1e-6-quantized integer
  * components and 1e-4-quantized means ([[fixtureTable]]); projections
  * are then INTEGER dot products of 1e-4-quantized elements — the
  * [[RandomProjection]] discipline — so Spark and the DuckDB oracle
  * agree bit-for-bit.
  */
object Pca {

  /** mean(d) + components(nComp × d), double precision (quantization
    * happens at the projection/fixture boundary). */
  final case class Model(mean: Array[Double], comps: Array[Array[Double]])

  /** One-scan moment accumulation: (n, Σx, Σx xᵀ) per partition, folded
    * driver-side in partition order. */
  private def moments(df: DataFrame, vecCol: String, d: Int)
      : (Long, Array[Double], Array[Double]) = {
    val spark = df.sparkSession
    import spark.implicits._
    val parts = df.select(col(vecCol)).as[Array[Float]]
      .mapPartitions { it =>
        var n = 0L
        val s = new Array[Double](d)
        val g = new Array[Double](d * d)
        while (it.hasNext) {
          val x = it.next()
          require(x.length == d, s"expected dim $d, got ${x.length}")
          n += 1
          var j = 0
          while (j < d) {
            val xj = x(j).toDouble
            s(j) += xj
            var k = j
            while (k < d) { g(j * d + k) += xj * x(k).toDouble; k += 1 }
            j += 1
          }
        }
        if (n == 0) Iterator.empty
        else Iterator.single((n, s, g))
      }
    // partition summaries are tiny (1 + d + d² doubles each); fold in
    // a stable order so double addition is reproducible
    val collected = parts.collect()
    val n = collected.map(_._1).sum
    val s = new Array[Double](d)
    val g = new Array[Double](d * d)
    collected.foreach { case (_, ps, pg) =>
      var i = 0
      while (i < d) { s(i) += ps(i); i += 1 }
      i = 0
      while (i < d * d) { g(i) += pg(i); i += 1 }
    }
    // mirror the upper triangle
    var j = 0
    while (j < d) {
      var k = j + 1
      while (k < d) { g(k * d + j) = g(j * d + k); k += 1 }
      j += 1
    }
    (n, s, g)
  }

  /** Fit `nComp` principal components of the `vecCol` array<float>
    * column (dimension `d`) — one distributed scan, driver-side
    * eigensolve. */
  def fit(df: DataFrame, vecCol: String, d: Int, nComp: Int,
      iters: Int = 100): Model = {
    require(nComp >= 1 && nComp <= d, "1 <= nComp <= d")
    val (n, s, g) = moments(df, vecCol, d)
    require(n >= 2, s"need >= 2 rows, got $n")
    val mean = s.map(_ / n)
    // C = (G - n·m mᵀ) / (n-1)
    val cov = new Array[Double](d * d)
    var j = 0
    while (j < d) {
      var k = 0
      while (k < d) {
        cov(j * d + k) = (g(j * d + k) - n * mean(j) * mean(k)) / (n - 1)
        k += 1
      }
      j += 1
    }
    val comps = new Array[Array[Double]](nComp)
    for (c <- 0 until nComp) {
      // deflated power iteration from the fixed basis vector e_c
      var v = Array.tabulate(d)(i => if (i == c) 1.0 else 0.0)
      for (_ <- 0 until iters) {
        val w = new Array[Double](d)
        var a = 0
        while (a < d) {
          var acc = 0.0
          var b = 0
          while (b < d) { acc += cov(a * d + b) * v(b); b += 1 }
          w(a) = acc
          a += 1
        }
        // project out earlier components (Gram–Schmidt deflation)
        for (p <- 0 until c) {
          val dot = (0 until d).map(i => w(i) * comps(p)(i)).sum
          var i = 0
          while (i < d) { w(i) -= dot * comps(p)(i); i += 1 }
        }
        val norm = math.sqrt(w.map(x => x * x).sum)
        v = if (norm > 0) w.map(_ / norm) else v
      }
      // canonical sign: largest-|coordinate| positive, lowest index wins
      val pivot = v.indices.maxBy(i => (math.abs(v(i)), -i))
      if (v(pivot) < 0) v = v.map(-_)
      comps(c) = v
    }
    Model(mean, comps)
  }

  /** Quantized model as a frame: (i, qmean, qc0, qc1, …) — the aux
    * fixture the DuckDB oracle replays projections from. Means at
    * 1e-4 (element scale), components at 1e-6. */
  def fixtureTable(spark: SparkSession, model: Model): DataFrame = {
    import spark.implicits._
    val d = model.mean.length
    val rows = (0 until d).map { i =>
      (i, math.round(model.mean(i) * 10000),
        model.comps.map(c => math.round(c(i) * 1000000)).toSeq)
    }
    val base = rows.toDF("i", "qmean", "qcs")
    val cols = col("i") +: col("qmean") +:
      model.comps.indices.map(c => col("qcs").getItem(c).as(s"qc$c"))
    base.select(cols: _*)
  }

  /** Exact integer projections of the 1e-4-quantized, mean-centered
    * elements onto the quantized components: one output column per
    * component, shuffle-free. */
  def projectExact(df: DataFrame, idCol: String, vecCol: String,
      model: Model): DataFrame = {
    val d = model.mean.length
    val qmean = typedLit(model.mean.map(m => math.round(m * 10000)).toSeq)
    val xc = zip_with(
      transform(col(vecCol), x => round(x.cast("double") * 10000)
        .cast("long")),
      qmean, (x, m) => x - m)
    val projCols = model.comps.zipWithIndex.map { case (comp, c) =>
      val qc = typedLit(comp.map(v => math.round(v * 1000000)).toSeq)
      aggregate(zip_with(xc, qc, (x, w) => x * w), lit(0L),
        (acc, t) => acc + t).as(s"p$c")
    }
    df.select((col(idCol) +: projCols): _*)
  }
}
