package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.classic.{GraftColumnBridge => bridge}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.plans.CosineSimilarity

/** Spherical k-means over an embedding column and the SemDeDup-style
  * semantic near-duplicate collapse built on it (Abbas et al., "SemDeDup:
  * Data-efficient learning at web-scale through semantic deduplication",
  * 2023): cluster with cosine assignment, then search for near-duplicates
  * only WITHIN a cluster — the cluster id plays the role every other
  * dedup path gives a hash bucket, turning O(n²) pairwise cosine into
  * k × O((n/k)²) with candidates drawn from an equi-join.
  *
  * Determinism contract (gate + fixture must agree bit-for-bit within a
  * run): init picks the k seeds with the smallest md5(id) — order-stable
  * and engine-portable; centroid means are summed in DECIMAL, so the
  * result is independent of shuffle-reduce arrival order (a double sum
  * is not); assignment is the native codegen'd [[CosineSimilarity]],
  * a sequential fold. Ties in the argmax break toward the lowest
  * cluster id on both engines (first position of the max).
  *
  * Scale shape: each iteration is one assignment pass (k fused-loop
  * cosines per row, no shuffle) plus one (cluster, pos)-keyed partial
  * aggregation whose output is k×dim rows; centroids live on the driver
  * between iterations (k×dim floats), exactly like every production
  * k-means. Cluster count k should grow with the corpus (SemDeDup runs
  * k in the tens of thousands at web scale) so the within-cluster
  * pairwise stays bounded.
  */
object Clustering {

  /** Cosine of `vec` against one literal centroid (codegen'd). */
  private def cosTo(vec: Column, centroid: Seq[Float]): Column =
    bridge.column(CosineSimilarity(bridge.expression(vec),
      bridge.expression(typedlit(centroid))))

  private def cosines(vec: Column, centroids: Seq[Seq[Float]]): Column =
    array(centroids.map(c => nanvl(cosTo(vec, c), lit(-2.0))): _*)

  /** Fit spherical k-means: returns the k centroids (index = cluster
    * id) — fewer than k when the input has fewer than k rows (callers
    * get exactly one seed per available row). Empty clusters keep their
    * previous centroid. */
  def fit(emb: DataFrame, idCol: String, vecCol: String, k: Int,
      iters: Int): Seq[Seq[Float]] = {
    require(k > 0 && iters >= 0, "k and iters must be positive")
    // persisted: init + every Lloyd iteration re-consume the projection;
    // without this each of the iters+1 jobs re-derives the upstream
    // (possibly a planted/transformed corpus) from the scan. try/finally
    // so a failed iteration doesn't leave the projection cached forever.
    val v = emb.select(col(idCol).as("id"), col(vecCol).as("v")).persist()
    try {
      var centroids: Seq[Seq[Float]] = v
        .orderBy(md5(col("id").cast("string")))
        .limit(k)
        .select(col("v"))
        .collect().map(_.getSeq[Float](0).toSeq).toSeq
      for (_ <- 0 until iters) {
        val assigned = v.select(col("v"),
          argmax(cosines(col("v"), centroids)).as("cluster"))
        // DECIMAL sums: bit-deterministic means regardless of which
        // reduce-side order the partial aggregates arrive in
        val means = assigned
          .select(col("cluster"), posexplode(col("v")).as(Seq("pos", "x")))
          .groupBy("cluster", "pos")
          .agg((sum(col("x").cast("decimal(27,12)")) / count(lit(1)))
            .cast("double").cast("float").as("m"))
          .collect()
          .groupBy(_.getInt(0))
          .map { case (c, rows) =>
            c -> rows.sortBy(_.getInt(1)).map(_.getFloat(2)).toSeq
          }
        centroids =
          centroids.indices.map(i => means.getOrElse(i, centroids(i)))
      }
      centroids
    } finally v.unpersist()
  }

  /** First index of the array's max — the argmax with ties toward the
    * lowest cluster id (mirrors SQL `list_position(l, list_max(l))`). */
  private def argmax(arr: Column): Column =
    (array_position(arr, array_max(arr)) - 1).cast("int")

  /** Assign every vector to its nearest centroid by cosine.
    * Returns (id, cluster, cos). */
  def assign(emb: DataFrame, idCol: String, vecCol: String,
      centroids: Seq[Seq[Float]]): DataFrame = {
    val cs = cosines(col(vecCol), centroids)
    emb.select(col(idCol).as("id"),
      argmax(cs).as("cluster"),
      array_max(cs).as("cos"))
  }

  /** Fit + assign in one call (the gate shape). */
  def fitAssign(emb: DataFrame, idCol: String, vecCol: String, k: Int,
      iters: Int): DataFrame =
    assign(emb, idCol, vecCol, fit(emb, idCol, vecCol, k, iters))

  /** SemDeDup: near-duplicate pairs (cosine >= threshold) found within
    * clusters only. Returns (id_a, id_b, cos) with id_a < id_b. The
    * within-cluster join is the scale guard — pairs across clusters are
    * never enumerated. */
  def semanticDedupPairs(emb: DataFrame, idCol: String, vecCol: String,
      centroids: Seq[Seq[Float]], threshold: Double): DataFrame = {
    // cluster computed directly on the projection (no join back for the
    // vector), and the tagged frame is checkpointed: it feeds BOTH sides
    // of the self-join, which would otherwise re-derive the whole
    // upstream (in CorpusCurate: the full curation chain) per side
    val tagged = emb
      .select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("cluster", argmax(cosines(col("v"), centroids)))
      .localCheckpoint(true)
    val a = tagged.select(col("cluster"), col("id").as("id_a"),
      col("v").as("va"))
    val b = tagged.select(col("cluster"), col("id").as("id_b"),
      col("v").as("vb"))
    a.join(b, Seq("cluster"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos", bridge.column(CosineSimilarity(
        bridge.expression(col("va")), bridge.expression(col("vb")))))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), col("cos"))
  }
}
