package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.classic.{GraftColumnBridge => bridge}
import org.apache.spark.sql.functions._

/** Product quantization (Jégou et al., "Product Quantization for Nearest
  * Neighbor Search", PAMI 2011): split each `dim`-vector into `m`
  * contiguous subvectors, k-means each subspace to `ksub` centroids, and
  * represent a vector as `m` small codes — 64 float32 dims (256 B)
  * compress to 8 bytes at m=8/ksub=16. Queries scan CODES, not vectors:
  * the asymmetric distance (ADC) between query and a database vector is
  * the sum of m precomputed query→centroid sub-distances looked up by
  * code.
  *
  * Scale shape — why this is the 100 TB path next to the exact scan
  * ([[SimilaritySearch.bruteForceTopK]]) and IVF
  * ([[SimilaritySearch.annTopK]]):
  *  - training touches the corpus `iters` times but each pass is one
  *    assignment scan (codegen'd sub-distance folds, no shuffle) plus a
  *    (subspace, code, pos)-keyed partial aggregate whose output is
  *    m×ksub×dsub rows — the codebooks live on the driver like
  *    [[Clustering.fit]]'s centroids (m×ksub×dsub floats, ~4 KB here);
  *  - encoding is a pure projection (argmin over ksub literal-centroid
  *    distances per subspace), no shuffle, no join;
  *  - ADC search broadcasts an m×ksub lookup TABLE (not the query), so
  *    the scan reads `m` ints per row instead of `dim` floats — a 32×
  *    I/O cut on a persisted codes table — and ends in one
  *    TakeOrderedAndProject.
  *
  * Determinism contract (the [[Clustering]] discipline): seeds are the
  * ksub vectors with the smallest md5(id) — engine-portable ordering;
  * centroid means are summed in DECIMAL so shuffle arrival order cannot
  * perturb them; sub-distances are sequential double folds in array
  * order; argmin ties break toward the LOWEST code on both engines
  * (first position of the min). The DuckDB oracle replays encode + ADC
  * from the codebook fixture ([[codebookTable]]) in plain SQL.
  */
object ProductQuantization {

  /** Trained codebooks: `centroids(j)(c)` is the dsub-dim centroid for
    * code `c` of subspace `j`. */
  final case class Codebooks(dim: Int, m: Int,
      centroids: Vector[Vector[Vector[Float]]]) {
    require(dim % m == 0, s"dim $dim not divisible by m $m")
    val dsub: Int = dim / m
    def ksub: Int = centroids.head.size
  }

  /** All m codes of a vector in one fused native loop — the codegen'd
    * [[graft.plans.PqEncode]] expression (the HOF formulation hit the
    * interpreted-lambda + no-CSE perf cliffs; see its scaladoc). */
  private def codesCol(vec: Column, cb: Codebooks): Column =
    bridge.column(graft.plans.PqEncode(bridge.expression(vec),
      cb.centroids))

  /** Encode every vector to its m codes: (id, codes array<int>). A pure
    * projection — persist this next to the corpus and ADC queries never
    * touch the raw vectors again. */
  def encode(emb: DataFrame, idCol: String, vecCol: String,
      cb: Codebooks): DataFrame =
    emb.select(col(idCol).as("id"),
      codesCol(col(vecCol), cb).as("codes"))

  /** Train per-subspace k-means — ALL m subspaces learned in one job per
    * iteration (cluster key = (subspace, code), not m separate k-means
    * runs). Seeds: the ksub smallest-md5(id) vectors, split into their
    * subvectors. */
  def train(emb: DataFrame, idCol: String, vecCol: String, dim: Int,
      m: Int, ksub: Int, iters: Int): Codebooks = {
    require(dim % m == 0, s"dim $dim not divisible by m $m")
    require(ksub > 0 && iters >= 0, "ksub and iters must be positive")
    val dsub = dim / m
    val v = emb.select(col(idCol).as("id"), col(vecCol).as("v")).persist()
    try {
      val seedRows = v.orderBy(md5(col("id").cast("string"))).limit(ksub)
        .select(col("v")).collect().map(_.getSeq[Float](0).toVector).toVector
      // codes from PqEncode range over the ACTUAL seed count: a corpus
      // smaller than ksub would leave unseeded codebook slots that the
      // Lloyd fallback below dereferences out of bounds — fail loudly
      require(seedRows.size >= ksub,
        s"corpus has ${seedRows.size} rows < ksub=$ksub — " +
          "lower ksub or train on a larger corpus")
      var cb = Codebooks(dim, m, Vector.tabulate(m)(j =>
        seedRows.map(r => r.slice(j * dsub, (j + 1) * dsub))))
      for (_ <- 0 until iters) {
        // one scan: every row contributes (subspace, code, pos, x) for
        // each of its m subvectors; DECIMAL means, k×m×dsub result rows
        val assigned = v.select(col("v"),
          codesCol(col("v"), cb).as("codes"))
        val means = assigned
          .select(posexplode(col("v")).as(Seq("pos", "x")), col("codes"))
          .select((col("pos") / dsub).cast("int").as("subspace"),
            pmod(col("pos"), lit(dsub)).cast("int").as("spos"),
            element_at(col("codes"),
              (col("pos") / dsub).cast("int") + 1).as("code"),
            col("x"))
          .groupBy("subspace", "code", "spos")
          .agg((sum(col("x").cast("decimal(27,12)")) / count(lit(1)))
            .cast("double").cast("float").as("mean"))
          .collect()
          .groupBy(r => (r.getInt(0), r.getInt(1)))
          .map { case (k, rows) =>
            k -> rows.sortBy(_.getInt(2)).map(_.getFloat(3)).toVector
          }
        cb = Codebooks(dim, m, Vector.tabulate(m)(j =>
          Vector.tabulate(ksub)(c =>
            means.getOrElse((j, c), cb.centroids(j)(c)))))
      }
      cb
    } finally v.unpersist()
  }

  /** Codebooks as a frame (subspace, code, pos, val) — the aux fixture
    * the DuckDB oracle replays encode/ADC from (pos is 1-based within
    * the subspace, matching SQL list indexing). */
  def codebookTable(spark: SparkSession, cb: Codebooks): DataFrame = {
    import spark.implicits._
    (for {
      j <- 0 until cb.m; c <- 0 until cb.ksub
      (x, p) <- cb.centroids(j)(c).zipWithIndex
    } yield (j, c, p + 1, x)).toDF("subspace", "code", "pos", "val")
  }

  /** ADC top-k: encode in-plan (or pass a pre-encoded codes frame to
    * [[adcTopKCodes]]) and rank by the summed query→centroid lookup.
    * The m×ksub distance table is a plan literal — broadcast with the
    * task binaries, no join. */
  def adcTopK(emb: DataFrame, idCol: String, vecCol: String,
      cb: Codebooks, queryVec: Seq[Float], k: Int): DataFrame =
    adcTopKCodes(encode(emb, idCol, vecCol, cb), cb, queryVec, k)

  /** The m×ksub query→centroid distance table (the ADC lookup),
    * precomputed driver-side — m·ksub doubles, a plan literal. */
  private def distanceLut(cb: Codebooks,
      queryVec: Seq[Float]): Seq[Seq[Double]] = {
    require(queryVec.size == cb.dim, "query dim mismatch")
    (0 until cb.m).map { j =>
      val q = queryVec.slice(j * cb.dsub, (j + 1) * cb.dsub)
      cb.centroids(j).map(c =>
        q.zip(c).map { case (a, b) =>
          (a.toDouble - b.toDouble) * (a.toDouble - b.toDouble)
        }.sum)
    }
  }

  /** ADC lookup-sum over a CODES column — the codegen'd
    * [[graft.plans.AdcSum]] expression. The HOF formulation
    * (`aggregate(zip_with(element_at(element_at(lut, j), c + 1)))`)
    * hit the interpreted-lambda + no-CSE cliffs exactly like encode
    * did before [[graft.plans.PqEncode]]; see AdcSum's scaladoc for
    * the measured A/B. */
  private def adcOfCodes(codes: Column, cb: Codebooks,
      queryVec: Seq[Float]): Column =
    bridge.column(graft.plans.AdcSum(bridge.expression(codes),
      distanceLut(cb, queryVec)))

  /** ADC distance of a raw VECTOR column against `queryVec` — encode +
    * lookup-sum fused into one expression, for composes that carry the
    * vector through the shortlist (IVF-PQ: see
    * [[SimilaritySearch.ivfPqTopK]]). NULL for undecodable vectors
    * (short / null-element) — callers filter like [[adcTopKCodes]]. */
  def adcColumn(vec: Column, cb: Codebooks,
      queryVec: Seq[Float]): Column =
    adcOfCodes(codesCol(vec, cb), cb, queryVec)

  /** ADC over a codes frame (id, codes): the persisted-index path —
    * reads m ints per row, never the vectors. */
  def adcTopKCodes(codes: DataFrame, cb: Codebooks, queryVec: Seq[Float],
      k: Int): DataFrame = {
    codes
      .select(col("id"),
        adcOfCodes(col("codes"), cb, queryVec).as("adc"))
      // undecodable rows (short/null-element vectors → null codes →
      // null adc) are EXCLUDED: ASC default is NULLS FIRST, so an
      // unfiltered corrupt row would otherwise claim rank 1
      .filter(col("adc").isNotNull)
      .orderBy(col("adc").asc, col("id"))
      .limit(k)
  }
}
