package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import org.apache.spark.sql.classic.GraftColumnBridge

import graft.plans.{CosineSimilarity, HyperplaneBuckets}

/** Vector primitives over `ARRAY<FLOAT>` embedding columns.
  *
  * `cosine` is a native codegen'd Catalyst expression
  * ([[graft.plans.CosineSimilarity]] — one fused loop); `cosineHof` is
  * the equivalent higher-order-function form, kept as the
  * pure-built-ins reference implementation. The two are bit-identical
  * for equal-length arrays with non-null elements (same sequential
  * double arithmetic; spec-asserted). Edge inputs diverge by design:
  * the native expression iterates the common prefix of mismatched-
  * length arrays and reads elements positionally, while zip_with pads
  * the shorter array with nulls and null-propagates — don't rely on
  * either behavior for malformed vectors; validate lengths upstream.
  */
object VectorOps {

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
      lit(0.0), (acc, z) => acc + z)

  def norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0),
      (acc, x) => acc + x.cast(DoubleType) * x.cast(DoubleType)))

  def cosine(a: Column, b: Column): Column =
    GraftColumnBridge.column(CosineSimilarity(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  def cosineHof(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Deterministic pseudo-random hyperplanes: component j of plane p in
    * table t is derived from a seeded hash, mapped to [-1, 1). Generated
    * driver-side as literals — tiny (tables×planes×dim doubles) and
    * identical on every executor. */
  private def planeLiteral(dim: Int, planes: Int, tables: Int, seed: Long)
    : Array[Array[Array[Double]]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(tables, planes, dim)(rnd.nextDouble() * 2 - 1)
  }

  /** Random-hyperplane LSH signatures: for each table, a bucket id packs
    * the sign bits of the vector's dot product with each plane.
    * Output: (id, table, bucket). Native single-loop expression
    * ([[graft.plans.HyperplaneBuckets]]) — bit-identical to
    * [[hyperplaneSignaturesHof]] (spec-enforced) but without the
    * tables×planes interpreted-lambda passes per row. */
  def hyperplaneSignatures(emb: DataFrame, idCol: String, vecCol: String,
      dim: Int, planes: Int, tables: Int, seed: Long): DataFrame = {
    val buckets = bucketColumn(col(vecCol), dim, planes, tables, seed)
    emb.select(col(idCol).as("id"), posexplode(buckets))
      .toDF("id", "table", "bucket")
  }

  /** The per-row LSH bucket array (one long per table) as a COLUMN —
    * the scan-side building block [[hyperplaneSignatures]] explodes.
    * Exposed so probe paths can compare buckets in a filter without
    * materializing the exploded index frame. */
  private[graft] def bucketColumn(vec: Column, dim: Int, planes: Int,
      tables: Int, seed: Long): Column = {
    val ps = planeLiteral(dim, planes, tables, seed)
    val flat = new Array[Double](tables * planes * dim)
    for (t <- 0 until tables; p <- 0 until planes; j <- 0 until dim)
      flat((t * planes + p) * dim + j) = ps(t)(p)(j)
    // immutable Seq: the expression keeps structural equality (CSE /
    // exchange reuse) — see HyperplaneBuckets' field comment
    GraftColumnBridge.column(HyperplaneBuckets(
      GraftColumnBridge.expression(vec), flat.toIndexedSeq, tables,
      planes, dim))
  }

  /** One vector's LSH signature computed DRIVER-side — pure arithmetic
    * on the seeded planes, no Spark job. Mirrors
    * [[graft.plans.HyperplaneBuckets]] loop for loop (same Double
    * accumulation order), so query-side buckets are bit-identical to
    * scan-side ones. */
  private[graft] def signatureOf(vec: Seq[Float], dim: Int, planes: Int,
      tables: Int, seed: Long): Array[Long] = {
    require(vec.length == dim, s"vector dim ${vec.length} != $dim")
    require(planes >= 1 && planes <= 63,
      s"planes $planes outside [1, 63] — 1L << p wraps mod 64 " +
        "(HyperplaneBuckets enforces the same bound scan-side)")
    val ps = planeLiteral(dim, planes, tables, seed)
    Array.tabulate(tables) { t =>
      var bucket = 0L
      var p = 0
      while (p < planes) {
        var s = 0.0
        var j = 0
        while (j < dim) { s += vec(j).toDouble * ps(t)(p)(j); j += 1 }
        if (s >= 0) bucket |= 1L << p
        p += 1
      }
      bucket
    }
  }

  /** Symmetric per-vector int8 quantization: scale = 127 / max|x_i|
    * (1.0 for the zero vector), q_i = round(x_i · scale) ∈ [-127, 127].
    * Returns struct(scale DOUBLE, q ARRAY<TINYINT>) — a 4× smaller
    * embedding representation (the 100 TB storage/IO lever; dequantize
    * as q_i/scale with per-element error ≤ 0.5/scale). The scale is
    * BOUND once per row via [[graft.functions.TextFunctions.bind]]:
    * projection collapse substitutes upstream expressions into every
    * lambda reference site (no CSE inside lambdas), so a naive
    * col("scale") would re-derive the array_max per element — same
    * cliff as Dedup.bandedCandidates. */
  def quantizeInt8(v: Column): Column = {
    // empty vectors: array_max is NULL, which must hit the 1.0 guard
    // like the all-zero vector (NULL === 0d is NULL, not true).
    // NaN elements are excluded from the max — array_max ranks NaN
    // above every double, so one corrupt component would otherwise make
    // scale = 127/NaN = NaN (which passes both guards) and zero the
    // ENTIRE quantized vector; excluded, valid components keep their
    // scale and the NaN slots quantize to 0 (explicit — ANSI mode
    // rejects the NaN→byte cast)
    val mx = array_max(filter(
      transform(v, e => abs(e.cast(DoubleType))), e => !isnan(e)))
    val scale = when(mx.isNull || mx === 0d, lit(1.0))
      .otherwise(lit(127.0) / mx)
    graft.functions.TextFunctions.bind(struct(scale.as("s"), v.as("v"))) {
      r =>
        struct(r.getField("s").as("scale"),
          transform(r.getField("v"), e =>
            when(isnan(e), lit(0).cast(ByteType)).otherwise(
              round(e.cast(DoubleType) * r.getField("s")).cast(ByteType)))
            .as("q"))
    }
  }

  /** Sign-bit binary quantization (Charikar 2002 SimHash / modern
    * binary-embedding practice): dims `[lo, lo+32)` packed into one
    * long, bit i set iff `v[lo+i] > 0`. Two calls cover a 64-dim
    * embedding as (w1, w2) — 16 bytes per vector, a 16× cut over
    * float32, with Hamming distance (`bit_count(w1 ^ qw1) + ...`) as
    * the codegen'd integer metric. The standard first-pass filter for
    * billion-vector search: scan the packed codes, re-rank survivors
    * with exact cosine; at 100 TB bucket by a code prefix and the scan
    * prunes like [[hyperplaneSignatures]]' IVF path. */
  def binarizeWord(v: Column, lo: Int): Column =
    aggregate(
      transform(slice(v, lo + 1, 32),
        // 2^i as the bit mask: exact in double for i <= 31 (the word
        // width), sidestepping shiftleft's literal-only shift argument
        (x, i) => when(x > 0f, pow(lit(2.0), i).cast(LongType))
          .otherwise(lit(0L))),
      lit(0L), (acc, b) => acc.bitwiseOR(b))

  /** L2 normalization: x / ||x||, the zero vector passed through
    * unchanged (a 0/0 NaN vector would poison every downstream cosine).
    * The norm is BOUND once per row via bind — an unbound `nrm` inside
    * the transform lambda would re-run the sum-of-squares aggregate per
    * element (projection collapse duplicates subtrees into lambda
    * reference sites, the same cliff as [[quantizeInt8]]). */
  def l2Normalize(v: Column): Column = {
    val nrm = norm(v)
    graft.functions.TextFunctions.bind(struct(nrm.as("n"), v.as("v"))) { r =>
      when(r.getField("n") === 0d,
        transform(r.getField("v"), e => e.cast(DoubleType)))
        .otherwise(transform(r.getField("v"),
          e => e.cast(DoubleType) / r.getField("n")))
    }
  }

  /** Matryoshka truncation: keep the first `dims` components and
    * re-normalize — the MRL serving trade (Kusupati et al. 2022):
    * embeddings trained with matryoshka losses keep most of their
    * retrieval quality at a prefix of the dimensions, so storing /
    * searching the 16-dim prefix instead of the full vector is a
    * dims/16 I/O and compute cut on a 100 TB vector corpus. Pure
    * projection, no shuffle. */
  def matryoshka(v: Column, dims: Int): Column = {
    require(dims > 0, s"dims must be positive: $dims")
    l2Normalize(slice(v, 1, dims))
  }

  /** Pure-built-ins reference form of [[hyperplaneSignatures]] — kept as
    * the cross-check implementation (one interpreted aggregate/zip_with
    * chain per (table, plane): correct, slow). */
  private[graft] def hyperplaneSignaturesHof(emb: DataFrame, idCol: String,
      vecCol: String, dim: Int, planes: Int, tables: Int,
      seed: Long): DataFrame = {
    require(planes >= 1 && planes <= 63,
      s"planes $planes outside [1, 63] — 1L << p wraps mod 64")
    val ps = planeLiteral(dim, planes, tables, seed)
    val sigCols: Seq[Column] = (0 until tables).map { t =>
      val bucket = (0 until planes).map { p =>
        val plane = array(ps(t)(p).map(lit): _*)
        when(dot(col(vecCol), plane) >= 0, lit(1L << p)).otherwise(lit(0L))
      }.reduce(_ + _)
      struct(lit(t).as("table"), bucket.as("bucket"))
    }
    emb.select(col(idCol).as("id"),
      explode(array(sigCols: _*)).as("sig"))
      .select(col("id"), col("sig.table").as("table"),
        col("sig.bucket").as("bucket"))
  }
}
