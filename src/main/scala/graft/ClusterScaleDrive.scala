package graft

import org.apache.spark.sql.functions._

import graft.operators.Clustering

/** Scale drive for SemDeDup's k-scaling rule (Clustering.scala: cluster
  * count k must grow with the corpus so the within-cluster pairwise
  * join stays bounded). Sweeps k and MEASURES the number — the
  * within-cluster candidate-pair count Σ n_c·(n_c−1)/2 — that the rule
  * bounds, against the n²/2 brute-force pair count it replaces.
  *
  * Vectors are a deterministic hash-seeded mixture (`latent` centers +
  * noise), so cluster structure exists and runs reproduce exactly.
  * Fit runs on an md5-ordered sample (standard practice — centroid
  * quality needs a sample, not the corpus); assignment runs on all
  * rows. Timings cover fit + assign + the size aggregation.
  *
  * Usage: runMain graft.ClusterScaleDrive [rows] [dim] [latent] [ks...]
  */
object ClusterScaleDrive {

  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toLong).getOrElse(2000000L)
    val dim = args.lift(1).map(_.toInt).getOrElse(16)
    val latent = args.lift(2).map(_.toInt).getOrElse(64)
    val ks = if (args.length > 3) args.drop(3).toSeq.map(_.toInt)
      else Seq(16, 32, 64, 128, 256)
    val spark = GraftSession.getOrCreate("graft-cluster-scale-drive")

    // center(id % latent) + 0.3·noise(id), every component a scaled
    // xxhash64 in [-1, 1] — deterministic, clusterable
    def h(seedCol: String, pos: Int, salt: Int) =
      (pmod(xxhash64(expr(seedCol), lit(pos), lit(salt)), lit(2000001L))
        / 1000000.0 - 1.0)
    val vec = array((0 until dim).map(p =>
      (h(s"id % $latent", p, 11) + h("id", p, 13) * 0.3)
        .cast("float")): _*)
    val emb = spark.range(rows).select(col("id"), vec.as("v"))
      .localCheckpoint() // measure clustering, not the generator

    val brutePairs = BigDecimal(rows) * BigDecimal(rows - 1) / 2
    println(s"[cluster-scale] n=$rows dim=$dim latent=$latent " +
      s"brute pairs=${brutePairs.toBigInt}")
    for (k <- ks) {
      val t0 = System.nanoTime()
      val sample = emb.orderBy(md5(col("id").cast("string"))).limit(50000)
      val centroids = Clustering.fit(sample, "id", "v", k, iters = 2)
      val sizes = Clustering.assign(emb, "id", "v", centroids)
        .groupBy("cluster").agg(count(lit(1)).as("n"))
        .select("n").collect().map(_.getLong(0))
      val secs = (System.nanoTime() - t0) / 1e9
      val pairs = sizes.map(n => BigDecimal(n) * BigDecimal(n - 1) / 2).sum
      val reduction = (brutePairs / pairs.max(BigDecimal(1)))
        .setScale(1, BigDecimal.RoundingMode.HALF_UP)
      println(f"[cluster-scale] k=$k%4d fit+assign=$secs%6.1f s " +
        s"clusters=${sizes.length} maxCluster=${sizes.max} " +
        s"withinClusterPairs=${pairs.toBigInt} bruteReduction=${reduction}x")
    }
    // capAssign (r7): the adaptive counterpart of the sweep above —
    // instead of choosing k per corpus, the leaf-size cap ENFORCES the
    // pair bound (Σ n_c·(n_c−1)/2 ≤ n·cap/2) at any n: the root splits
    // ~2n/cap ways (bounded 1024), stragglers re-split k-way. One run,
    // no tuning; report the same pair metric the sweep measures.
    val cap = args.lift(3 + ks.length).map(_.toInt).getOrElse(1000)
    val t0 = System.nanoTime()
    val leaves = Clustering
      .capAssign(emb, "id", "v", maxClusterSize = cap, k = 16, iters = 2)
      .groupBy("cluster").agg(count(lit(1)).as("n"))
      .select("n").collect().map(_.getLong(0)) // leaf-count-sized
    val secs = (System.nanoTime() - t0) / 1e9
    val pairs = leaves.map(n => BigDecimal(n) * BigDecimal(n - 1) / 2).sum
    val bound = BigDecimal(rows) * cap / 2
    println(f"[cluster-scale] capAssign cap=$cap assign=$secs%6.1f s " +
      s"leaves=${leaves.length} maxLeaf=${leaves.max} " +
      s"withinClusterPairs=${pairs.toBigInt} " +
      s"bound(n*cap/2)=${bound.toBigInt} " +
      s"bruteReduction=${(brutePairs / pairs.max(BigDecimal(1)))
        .setScale(1, BigDecimal.RoundingMode.HALF_UP)}x")
    spark.stop()
  }
}
