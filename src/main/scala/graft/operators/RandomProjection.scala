package graft.operators

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Random-projection dimensionality reduction (Johnson-Lindenstrauss
  * with a ±1 sign matrix, Achlioptas 2003 — public literature): project
  * a d-dim embedding onto k pseudo-random ±1 directions. Distances are
  * preserved within (1±ε) w.h.p. for k = O(log n / ε²) — the cheap
  * pre-step before clustering or ANN when d is large.
  *
  * Determinism without RNG state: sign(k, j) is the parity of the first
  * hex digit of md5("k_j") — reproducible on any engine (the s06 oracle
  * recomputes the identical matrix in DuckDB SQL), across retries and
  * speculative tasks (same discipline as the md5-uniform samplers).
  *
  * Exactness: elements are quantized to 1e-4 fixed-point longs first,
  * so each projection is an integer dot product — no float-summation
  * order sensitivity, bit-identical everywhere. Scale shape: a pure
  * projection (zip_with/aggregate HOFs over the embedding array), no
  * shuffle, no UDF; the sign matrix is k×d literals baked into the
  * plan.
  */
object RandomProjection {

  /** ±1 from the md5 parity of "k_j" — matches the SQL form
    * `CASE WHEN CAST('0x'||substr(md5(k||'_'||j),1,1) AS INT)%2=0
    * THEN 1 ELSE -1 END`. */
  private[operators] def sign(k: Int, j: Int): Long = {
    val md = MessageDigest.getInstance("MD5")
      .digest(s"${k}_$j".getBytes(StandardCharsets.UTF_8))
    val firstHexDigit = (md(0) >> 4) & 0xF
    if (firstHexDigit % 2 == 0) 1L else -1L
  }

  /** Project `embCol` (array<float>, dimension `d`) onto `k` ±1
    * directions; output one row per (id, proj_k) with the exact
    * integer projection of the 1e-4-quantized elements. */
  def projectExact(df: DataFrame, idCol: String, embCol: String,
      d: Int, k: Int): DataFrame = {
    require(d >= 1 && k >= 1, "d and k must be >= 1")
    val xf = transform(col(embCol),
      x => round(x.cast("double") * 10000).cast("long"))
    val projections: Seq[Column] = (0 until k).map { kk =>
      val signs = typedLit((0 until d).map(j => sign(kk, j)))
      struct(lit(kk).as("k"),
        aggregate(zip_with(xf, signs, (x, s) => x * s),
          lit(0L), (acc, t) => acc + t).as("proj"))
    }
    df.select(col(idCol), explode(array(projections: _*)).as("p"))
      .select(col(idCol), col("p.k"), col("p.proj"))
  }
}
