package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Baseline: brute-force cosine top-k — one broadcast of the query
  * vector, one distributed scan, a TakeOrderedAndProject for the top-k.
  * Scale path: IVF — k-means-free inverted file using LSH hyperplane
  * buckets as the coarse quantizer; the query probes only its own
  * bucket(s), turning a full scan into a partition-pruned one. At 100 TB
  * the bucketed table would be written out partitioned by (table, bucket)
  * so probes read only matching partitions.
  */
object SimilaritySearch {

  /** Exact brute-force top-k by cosine against one query vector.
    * `query` is a literal array column (broadcast with the plan). */
  def bruteForceTopK(emb: DataFrame, idCol: String, vecCol: String,
      query: Column, k: Int): DataFrame =
    emb.select(col(idCol), VectorOps.cosine(col(vecCol), query).as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)

  /** Build the IVF index: embeddings tagged with their LSH bucket per
    * table. Persist this (partitioned by table/bucket) to make probes
    * partition-pruned reads. */
  def ivfIndex(emb: DataFrame, idCol: String, vecCol: String, dim: Int,
      planes: Int = 6, tables: Int = 8, seed: Long = 42L): DataFrame =
    VectorOps.hyperplaneSignatures(emb, idCol, vecCol, dim, planes, tables, seed)
      .join(emb.select(col(idCol).as("id"), col(vecCol).as("vec")), Seq("id"))

  /** ANN top-k: rank only vectors sharing an LSH bucket with the query in
    * any table, then exact-cosine rerank. Recall < 1 by construction;
    * raise `tables`/lower `planes` to trade cost for recall. */
  def annTopK(index: DataFrame, queryVec: Seq[Float], dim: Int, k: Int,
      planes: Int = 6, tables: Int = 8, seed: Long = 42L): DataFrame = {
    val spark = index.sparkSession
    import spark.implicits._
    val qdf = Seq(Tuple1(queryVec)).toDF("qv")
    val qBuckets = VectorOps.hyperplaneSignatures(
      qdf.withColumn("id", lit(0L)), "id", "qv", dim, planes, tables, seed)
      .select("table", "bucket")
    val q = array(queryVec.map(lit): _*)
    index.join(broadcast(qBuckets), Seq("table", "bucket"), "left_semi")
      .select(col("id"), col("vec")).distinct()
      .select(col("id"), VectorOps.cosine(col("vec"), q).as("score"))
      .orderBy(col("score").desc, col("id"))
      .limit(k)
  }
}
