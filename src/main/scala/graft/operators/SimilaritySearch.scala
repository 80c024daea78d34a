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
    index.join(broadcast(qBuckets), Seq("table", "bucket"), "left_semi")
      .transform(rerank(queryVec, k))
  }

  /** Shared probe tail: dedup candidates (a vector matches in several
    * tables), exact-cosine rerank, deterministic top-k. One definition
    * so the in-memory and persisted paths cannot drift. */
  private def rerank(queryVec: Seq[Float], k: Int)(
      candidates: DataFrame): DataFrame = {
    val q = array(queryVec.map(lit): _*)
    candidates
      .select(col("id"), col("vec")).distinct()
      .select(col("id"), VectorOps.cosine(col("vec"), q).as("score"))
      .orderBy(col("score").desc, col("id"))
      .limit(k)
  }

  /** Persist the IVF index partitioned by (table, bucket) — the 100 TB
    * layout: each LSH bucket is its own partition directory, so a probe
    * reads ONLY the query's buckets (partition pruning at the file
    * listing, before any I/O). Build once, probe many. */
  def writeIndex(emb: DataFrame, idCol: String, vecCol: String, path: String,
      dim: Int, planes: Int = 6, tables: Int = 8, seed: Long = 42L): Unit =
    ivfIndex(emb, idCol, vecCol, dim, planes, tables, seed)
      .write.mode("overwrite")
      .partitionBy("table", "bucket")
      .parquet(path)

  /** ANN top-k against a [[writeIndex]]-persisted index: the bucket
    * predicate is a partition filter, so Spark's scan lists and reads
    * only the matching (table, bucket) directories — probe I/O is
    * proportional to bucket size, not corpus size (spec asserts the
    * pruned-partition count in the physical plan). Same deterministic
    * planes (seed) as index build. */
  def annTopKPersisted(spark: org.apache.spark.sql.SparkSession, path: String,
      queryVec: Seq[Float], dim: Int, k: Int, planes: Int = 6,
      tables: Int = 8, seed: Long = 42L): DataFrame = {
    import spark.implicits._
    val qdf = Seq(Tuple1(queryVec)).toDF("qv")
    val qBuckets = VectorOps.hyperplaneSignatures(
      qdf.withColumn("id", lit(0L)), "id", "qv", dim, planes, tables, seed)
      .select("table", "bucket")
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    // tables×1 bucket predicates — a literal partition filter the file
    // index prunes on (collect() is tables rows, driver-side by design)
    val probe = qBuckets.map { case (t, b) =>
      col("table") === t && col("bucket") === b
    }.reduce(_ || _)
    spark.read.parquet(path)
      .filter(probe)
      .transform(rerank(queryVec, k))
  }

  /** Hard-negative mining for contrastive training: for each query row
    * (rows matching `queryPred`), the top-`k` most-cosine-similar corpus
    * vectors with a DIFFERENT label — the "closest wrong answers" a
    * dual-encoder trains against.
    *
    * Candidate generation here is brute force over a BROADCAST query
    * set (queries are a curated sample by construction — per-batch
    * mining never scans queries × corpus with both sides large); the
    * corpus side streams in one scan, and per-query top-k is a
    * WindowGroupLimit, never a whole-partition sort. At retrieval scale,
    * swap the candidate pass for [[annTopKPersisted]] probes and keep
    * the same rerank/rank contract. Ranks order by the ROUNDED score
    * with id tie-break so the contract is engine-replayable. */
  def hardNegatives(emb: DataFrame, idCol: String, vecCol: String,
      labelCol: String, queryPred: Column, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = emb.filter(queryPred)
      .select(col(idCol).as("qid"), col(labelCol).as("qlabel"),
        col(vecCol).as("_qe"))
    val scored = emb.join(broadcast(q), col(labelCol) =!= col("qlabel"))
      .select(col("qid"),
        col(idCol).as("neg_id"), col(labelCol).as("neg_label"),
        round(VectorOps.cosine(col(vecCol), col("_qe")), 4).as("score"))
    val w = Window.partitionBy("qid")
      .orderBy(col("score").desc, col("neg_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }
}
