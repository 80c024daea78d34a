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
    * `query` is a literal array column (broadcast with the plan).
    * Zero-norm vectors (NaN cosine) are excluded — Spark orders NaN
    * ABOVE every double, so an unfiltered padding/all-zero row would
    * otherwise rank #1 at every rank site in this file. */
  def bruteForceTopK(emb: DataFrame, idCol: String, vecCol: String,
      query: Column, k: Int): DataFrame =
    emb.select(col(idCol), VectorOps.cosine(col(vecCol), query).as("score"))
      .filter(!isnan(col("score")))
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
      .filter(!isnan(col("score"))) // zero-norm guard (bruteForceTopK)
      .orderBy(col("score").desc, col("id"))
      .limit(k)
  }

  /** Scan-side ANN top-k — the one-job probe: the query's LSH signature
    * is computed DRIVER-side (pure arithmetic on the seeded planes —
    * [[VectorOps.signatureOf]], bit-identical to the scan expression),
    * and candidacy is a scan-side comparison of each row's bucket array
    * against those literals, so the whole probe is scan → filter →
    * TakeOrderedAndProject. No index materialization, no id↔vector
    * join, no query-signature job — same candidate set as
    * [[annTopK]] over [[ivfIndex]] by construction (spec-pinned).
    * Use THIS for ad-hoc in-memory probes; build [[writeIndex]] when
    * probing many queries against a persisted corpus. */
  def annTopKScan(emb: DataFrame, idCol: String, vecCol: String,
      queryVec: Seq[Float], dim: Int, k: Int, planes: Int = 6,
      tables: Int = 8, seed: Long = 42L): DataFrame =
    // rows are unique here (no per-(table, bucket) expansion), so the
    // rerank's candidate dedup shuffle is skipped
    lshCandidates(emb, vecCol, queryVec, dim, planes, tables, seed)
      .select(col(idCol).as("id"),
        VectorOps.cosine(col(vecCol),
          array(queryVec.map(lit): _*)).as("score"))
      .filter(!isnan(col("score")))
      .orderBy(col("score").desc, col("id"))
      .limit(k)

  /** The scan-side coarse candidate filter shared by [[annTopKScan]]
    * and [[ivfPqTopK]]: rows sharing at least one LSH bucket with the
    * query, whose signature is computed DRIVER-side. ONE reference to
    * the bucket expression — a per-table OR chain would inline the
    * non-codegen bucket computation `tables` times per row after
    * predicate pushdown; zip_with against the query's literal
    * signature keeps it a single evaluation. */
  def lshCandidates(emb: DataFrame, vecCol: String, queryVec: Seq[Float],
      dim: Int, planes: Int, tables: Int, seed: Long): DataFrame = {
    val qb = VectorOps.signatureOf(queryVec, dim, planes, tables, seed)
    val buckets = VectorOps.bucketColumn(col(vecCol), dim, planes,
      tables, seed)
    emb.filter(exists(
      zip_with(buckets, array(qb.map(lit(_)): _*), (b, q) => b === q),
      x => x))
  }

  /** IVF-PQ top-k (Jégou et al. 2011, the composition every
    * billion-scale ANN system runs): LSH coarse pruning picks the
    * candidate lists (the [[annTopKScan]] scan-side filter — at 100 TB
    * the same predicate prunes a (table, bucket)-partitioned codes
    * table), PQ asymmetric distance ranks candidates from `m` small
    * codes per row (never the raw floats — a 32× I/O cut on a
    * persisted index), and only the `rerank`-sized shortlist pays for
    * exact cosine. Three fidelity tiers, each touching ~10–100× less
    * data than the one below it.
    *
    * Determinism: the shortlist cut ranks on round(adc, 4) with the id
    * tie-break (raw-double ADC order can flip on engine ulp drift —
    * the t12 recipe), and the final rank does the same on the exact
    * cosine. Returns (id, score) with score the EXACT cosine rounded
    * to 4. */
  def ivfPqTopK(emb: DataFrame, idCol: String, vecCol: String,
      cb: ProductQuantization.Codebooks, queryVec: Seq[Float], dim: Int,
      k: Int, rerank: Int, planes: Int = 6, tables: Int = 8,
      seed: Long = 42L): DataFrame = {
    require(rerank >= k, s"rerank $rerank must be >= k $k")
    val shortlist = lshCandidates(emb, vecCol, queryVec, dim, planes,
      tables, seed)
      .select(col(idCol).as("id"), col(vecCol).as("vec"),
        round(ProductQuantization.adcColumn(col(vecCol), cb, queryVec), 4)
          .as("_adc"))
      .filter(col("_adc").isNotNull) // undecodable rows sort NULLS FIRST
      .orderBy(col("_adc"), col("id"))
      .limit(rerank)
    shortlist
      .select(col("id"),
        round(VectorOps.cosine(col("vec"), array(queryVec.map(lit): _*)), 4)
          .as("score"))
      .filter(!isnan(col("score")))
      .orderBy(col("score").desc, col("id"))
      .limit(k)
  }

  /** Persist the IVF index partitioned by (table, bucket) — the 100 TB
    * layout: each LSH bucket is its own partition directory, so a probe
    * reads ONLY the query's buckets (partition pruning at the file
    * listing, before any I/O). Build once, probe many. The build
    * params land in a `_ivf_params` sidecar so a probe with drifted
    * (dim, planes, tables, seed) fails loudly instead of matching
    * essentially-random buckets and returning plausible-looking wrong
    * neighbors. */
  def writeIndex(emb: DataFrame, idCol: String, vecCol: String, path: String,
      dim: Int, planes: Int = 6, tables: Int = 8, seed: Long = 42L): Unit = {
    // repartition ON the partition columns before the partitioned
    // write: without it every task writes its own file into every
    // (table, bucket) dir it holds rows for — tasks × dirs small files
    // (measured 32× the file count on the s16 gate). After the
    // shuffle each dir is written by exactly one task: one file per
    // partition, the small-files discipline a 100 TB index needs.
    ivfIndex(emb, idCol, vecCol, dim, planes, tables, seed)
      .repartition(col("table"), col("bucket"))
      .write.mode("overwrite")
      .partitionBy("table", "bucket")
      .parquet(path)
    // Sidecar goes through the Hadoop FileSystem resolved from the
    // session, not java.nio — on a cluster whose default FS isn't the
    // driver's local disk (HDFS/S3A), nio would either throw or write a
    // driver-local file the probe-side exists() never sees, silently
    // disabling the param-drift check.
    val sidecar = new org.apache.hadoop.fs.Path(path, "_ivf_params")
    val fs = sidecar.getFileSystem(
      emb.sparkSession.sparkContext.hadoopConfiguration)
    val out = fs.create(sidecar, true)
    try out.write(
      s"dim=$dim planes=$planes tables=$tables seed=$seed\n"
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Incrementally append a NEW batch to a [[writeIndex]]-persisted
    * index — the maintenance path a 100 TB pipeline actually runs:
    * bucket ONLY the incoming rows (one scan of the batch, never the
    * indexed corpus) and append their files into the existing
    * (table, bucket) partition directories. Because the LSH planes are
    * a pure function of (dim, planes, tables, seed), append-then-probe
    * is row-equivalent to a full rebuild on the unioned corpus — the
    * s16 gate pins that equivalence against the oracle.
    *
    * Refuses loudly when `path` is not an existing index (no
    * `_ivf_params` sidecar — appending would silently create a
    * checkless index) or when the passed params drift from the stored
    * ones (batch rows would land in buckets the probe's query
    * signature never visits: silent recall loss, the exact failure the
    * sidecar exists to prevent). The sidecar itself is left untouched.
    * Idempotence is the caller's job (re-appending the same batch
    * duplicates rows, as with any append-mode write). */
  def appendIndex(emb: DataFrame, idCol: String, vecCol: String,
      path: String, dim: Int, planes: Int = 6, tables: Int = 8,
      seed: Long = 42L): Unit = {
    val sidecar = new org.apache.hadoop.fs.Path(path, "_ivf_params")
    val fs = sidecar.getFileSystem(
      emb.sparkSession.sparkContext.hadoopConfiguration)
    require(fs.exists(sidecar),
      s"$path is not a writeIndex index (no _ivf_params sidecar) — " +
        "build it with writeIndex before appending")
    val want = s"dim=$dim planes=$planes tables=$tables seed=$seed"
    val in = fs.open(sidecar)
    val have =
      try new String(org.apache.hadoop.io.IOUtils.readFullyToByteArray(in),
        java.nio.charset.StandardCharsets.UTF_8).trim
      finally in.close()
    require(have == want,
      s"IVF append params ($want) != index build params ($have)")
    // one file per touched partition dir per batch (see writeIndex)
    ivfIndex(emb, idCol, vecCol, dim, planes, tables, seed)
      .repartition(col("table"), col("bucket"))
      .write.mode("append")
      .partitionBy("table", "bucket")
      .parquet(path)
  }

  /** Compact an appended index in place: [[appendIndex]] adds one file
    * per touched (table, bucket) dir per batch, so a year of daily
    * appends is ~365 files per hot bucket — footer/open cost dominates
    * probes long before data volume does. Rewrites the whole index back
    * to ONE file per partition dir under [[Layout.swapInPlace]]'s
    * guarded swap (same crash-safety contract as `Layout.compact`),
    * preserving the directory partitioning that [[annTopKPersisted]]'s
    * partition pruning depends on (a manifest-style flat file list
    * would lose the dir-encoded (table, bucket) pruning — this layout
    * compacts by rewrite, the plain table by `ManifestTable.compact`)
    * and carrying the `_ivf_params` sidecar across the swap. Probe
    * results are row-identical before and after (spec-pinned): rows
    * move between files, never between buckets. */
  def compactIndex(spark: org.apache.spark.sql.SparkSession,
      path: String): Unit = {
    val sidecar = new org.apache.hadoop.fs.Path(path, "_ivf_params")
    val fs = sidecar.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(sidecar),
      s"$path is not a writeIndex index (no _ivf_params sidecar)")
    val in = fs.open(sidecar)
    val params =
      try new String(org.apache.hadoop.io.IOUtils.readFullyToByteArray(in),
        java.nio.charset.StandardCharsets.UTF_8)
      finally in.close()
    Layout.swapInPlace(spark, path) { (df, tmp) =>
      df.repartition(col("table"), col("bucket"))
        .write.mode("overwrite")
        .partitionBy("table", "bucket")
        .parquet(tmp)
      val out = fs.create(new org.apache.hadoop.fs.Path(tmp, "_ivf_params"),
        true)
      try out.write(
        params.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
    }
  }

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
    // param-drift guard: query signatures computed with different
    // hyperplanes than the stored buckets probe random partitions and
    // return silently-wrong neighbors — refuse the mismatch
    val sidecar = new org.apache.hadoop.fs.Path(path, "_ivf_params")
    val fs = sidecar.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(sidecar)) {
      val want = s"dim=$dim planes=$planes tables=$tables seed=$seed"
      val in = fs.open(sidecar)
      val have =
        try new String(org.apache.hadoop.io.IOUtils.readFullyToByteArray(in),
          java.nio.charset.StandardCharsets.UTF_8).trim
        finally in.close()
      require(have == want,
        s"IVF probe params ($want) != index build params ($have)")
    }
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
      .filter(!isnan(col("score"))) // zero-norm guard (bruteForceTopK)
    val w = Window.partitionBy("qid")
      .orderBy(col("score").desc, col("neg_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Approximate kNN GRAPH: the k nearest neighbors of EVERY vector at
    * once — the batch primitive SemDeDup-style semantic dedup, cluster
    * seeding, and hard-negative mining all start from (vs [[annTopK]]'s
    * one query). Candidates are restricted to LSH bucket-mates
    * (`planes` sign bits × `tables` seeded tables — an equi-join on
    * (table, bucket), NEVER all-pairs), then exact native-expression
    * cosine ranks them; top-k per vector is a WindowGroupLimit, no
    * global sort. Fewer planes → bigger buckets → higher recall and
    * cost; vectors sharing no bucket contribute no edge.
    *
    * Ranking ties: cosine is ROUNDED to 4 digits before ranking and
    * ties break on neighbor id, so the edge list is deterministic and
    * engine-independent (raw-double ordering would flip on last-ulp
    * sum-order differences).
    *
    * At 100 TB: persist the signature frame partitioned by (table,
    * bucket) — the join becomes partition-local, and the per-bucket
    * row counts bound the quadratic term exactly like d03's banding. */
  /** Plane count that keeps expected bucket population ≈ `targetBucket`
    * as the corpus grows: 2^planes buckets per table ≈ n/targetBucket.
    * THE knn-graph scale lever — at fixed planes the within-bucket
    * candidate term grows quadratically in n (measured α≈1.34 on the
    * 10× probe); scaling planes with log2(n) pins bucket size, so cost
    * returns to ≈linear. Floor 4 keeps tiny corpora recall-rich. */
  def autoPlanes(n: Long, targetBucket: Int = 32): Int =
    math.max(4, math.ceil(
      math.log(math.max(1.0, n.toDouble / targetBucket)) / math.log(2.0))
      .toInt)

  def knnGraph(emb: DataFrame, idCol: String, vecCol: String, dim: Int,
      k: Int, planes: Int = 0, tables: Int = 2,
      seed: Long = 42L): DataFrame = {
    // planes <= 0 = auto: one count() sizes the index to the corpus
    val p = if (planes > 0) planes else autoPlanes(emb.count())
    val sigs = VectorOps.hyperplaneSignatures(emb, idCol, vecCol, dim,
      p, tables, seed).localCheckpoint() // both sides of the join
    val cand = sigs.toDF("id", "table", "bucket")
      .join(sigs.toDF("nb", "table", "bucket"), Seq("table", "bucket"))
      .filter(col("id") =!= col("nb"))
      .select("id", "nb").distinct()
    val a = emb.select(col(idCol).as("id"), col(vecCol).as("v_a"))
    val b = emb.select(col(idCol).as("nb"), col(vecCol).as("v_b"))
    val scored = cand.join(a, Seq("id")).join(b, Seq("nb"))
      .select(col("id"), col("nb"),
        round(VectorOps.cosine(col("v_a"), col("v_b")), 4).as("cosine"))
      .filter(!isnan(col("cosine"))) // zero-norm guard (bruteForceTopK)
    val w = org.apache.spark.sql.expressions.Window.partitionBy("id")
      .orderBy(col("cosine").desc, col("nb"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("id"), col("rank"), col("nb"), col("cosine"))
  }

  /** Maximal Marginal Relevance diversified top-k (Carbonell & Goldstein
    * 1998): greedily pick `k` results balancing relevance to the query
    * against redundancy with what's already picked —
    * `argmax λ·rel(i) − (1−λ)·max_{s∈S} sim(i,s)` per step, here at
    * λ=0.5 so the decision value is the integer `rel − max_sim` (×2).
    *
    * Exactness: similarity is the INTEGER dot product of 1e-4-quantized
    * elements (the s06 recipe) — every argmax compares exact integers,
    * so the greedy trajectory is deterministic and replayable cross-
    * engine (a float-cosine MMR would flip selections on last-ulp
    * drift; swap cosine in for production ranking, the greedy mechanics
    * are identical).
    *
    * Scale shape: stage 1 is the distributed part — integer relevance
    * scan + TakeOrderedAndProject to `topN` (at 100 TB this is the s01
    * IVF probe instead). Stage 2 collects only the topN candidate rows
    * (constant-bounded: topN×(dim+2) longs) and runs the O(k·topN)
    * greedy on the driver — the classic re-rank split.
    *
    * Output: (step, vec_id, rel, max_sim, mmr2x) — one row per pick, in
    * pick order. Ties break toward the smaller id. */
  def mmrDiversify(emb: DataFrame, idCol: String, vecCol: String,
      queryVec: Seq[Float], topN: Int, k: Int): DataFrame = {
    require(topN >= k && k >= 1, "need topN >= k >= 1")
    val spark = emb.sparkSession
    import spark.implicits._
    // Spark SQL round() is HALF_UP — quantize the driver-side query
    // vector identically (math.round floors negative halves)
    val qf: Seq[Long] = queryVec.map(x =>
      new java.math.BigDecimal(x.toDouble * 10000)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValue())
    val xf = transform(col(vecCol),
      x => round(x.cast("double") * 10000).cast("long"))
    val rel = emb
      .select(col(idCol).cast("long").as("vec_id"), xf.as("xf"))
      .withColumn("rel",
        aggregate(zip_with(col("xf"), typedLit(qf), (x, q) => x * q),
          lit(0L), (acc, t) => acc + t))
      .orderBy(col("rel").desc, col("vec_id"))
      .limit(topN)
    // constant-bounded collect: topN rows of (id, rel, dim longs) —
    // deduped by id (a duplicate-key corpus would otherwise leave the
    // greedy loop a row it can never pick and NPE past exhaustion)
    val cands = rel.select("vec_id", "rel", "xf").collect().map { r =>
      (r.getLong(0), r.getLong(1), r.getSeq[Long](2).toArray)
    }.distinctBy(_._1)
    def dot(a: Array[Long], b: Array[Long]): Long = {
      var s = 0L; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    val picked = scala.collection.mutable.ArrayBuffer
      .empty[(Int, Long, Long, Long, Long)]
    val used = scala.collection.mutable.Set.empty[Long]
    // classic MMR incremental form: per-candidate running max-sim,
    // refreshed with ONLY the newly picked vector each round — the
    // recompute-against-all-selected form is O(k²·topN·dim) and was
    // ~10× the necessary driver work at production topN. Integer max
    // over the same integer dots ⟹ the greedy trajectory (and the
    // emitted max_sim) is unchanged.
    // absent key = no picks yet (step 0 scores use 0, matching the
    // empty-selected convention); after the first pick every unused
    // candidate holds its true running max — SET on first update, max
    // after (dots can be negative, so a 0 default would overstate)
    val maxSim = scala.collection.mutable.Map.empty[Long, Long]
    var step = 0
    while (step < k && used.size < cands.length) {
      var best: (Long, Long, Long, Array[Long]) = null // (mmr2x,rel,id,v)
      cands.foreach { case (id, r, v) =>
        if (!used(id)) {
          val score = r - maxSim.getOrElse(id, 0L)
          if (best == null || score > best._1 ||
              (score == best._1 && id < best._3))
            best = (score, r, id, v)
        }
      }
      val (score, r, id, v) = (best._1, best._2, best._3, best._4)
      picked += ((step, id, r, maxSim.getOrElse(id, 0L), score))
      used += id
      cands.foreach { case (cid, _, cv) =>
        if (!used(cid)) {
          val s = dot(cv, v)
          maxSim(cid) = maxSim.get(cid).fold(s)(math.max(_, s))
        }
      }
      step += 1
    }
    picked.toSeq.toDF("step", "vec_id", "rel", "max_sim", "mmr2x")
  }
}
