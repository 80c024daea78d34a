package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton space-filling curve) layout for multi-column data
  * skipping — the file-layout lever the reference's secondary indexes
  * approximate (`README.md:138-141`): parquet keeps per-row-group
  * min/max stats, so laying rows out along a Z-curve gives every file a
  * NARROW value range in BOTH dimensions, and a predicate on either
  * column prunes most files. Public technique (Morton 1966; used by
  * every lakehouse layout optimizer); implemented here as pure Spark
  * expressions + a range-partitioned write.
  *
  * Scale shape: [[zValue]] is integer bit arithmetic — codegen'd, no
  * UDF, identical formula expressible in ANSI SQL (the q36 oracle runs
  * it in DuckDB). [[writeZOrdered]] adds one min/max aggregate (2 longs
  * to the driver), one range exchange on the z-value (sampled, no
  * global sort), and a within-partition sort — the standard cost of any
  * clustered write. Linear min/max scaling keeps the hot path
  * one-pass; swap in `approx_percentile` boundaries for heavily skewed
  * columns (the curve degrades gracefully either way).
  */
object ZOrder {

  /** Morton interleave of the low `bits` bits of two non-negative
    * integer columns: result bit 2i is bit i of `a`, bit 2i+1 is bit i
    * of `b`. 2·bits result bits; bits ≤ 31. */
  def zValue(a: Column, b: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")
    val mask = (1L << bits) - 1
    val am = a.cast("long").bitwiseAND(lit(mask))
    val bm = b.cast("long").bitwiseAND(lit(mask))
    (0 until bits).map { i =>
      shiftleft(shiftright(am, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(
          shiftleft(shiftright(bm, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)
  }

  /** The same interleave as ANSI SQL text (for cross-engine oracles). */
  def zValueSql(a: String, b: String, bits: Int = 16): String = {
    val mask = (1L << bits) - 1
    (0 until bits).map { i =>
      s"((($a & $mask) >> $i & 1) << ${2 * i}) | " +
        s"((($b & $mask) >> $i & 1) << ${2 * i + 1})"
    }.mkString("(", ") | (", ")")
  }

  /** Scale both columns linearly onto [0, 2^bits) from a SINGLE min/max
    * aggregate pass (one job, not one per column — at 100 TB each extra
    * pass is a full scan). Overflow bound: (x-lo)·2^bits is computed in
    * Long, so each column's span must stay ≤ 2^(63-bits) (~2^47 at the
    * default 16 bits) — enforced, with "reduce bits" as the remedy. */
  private def scaledBoth(df: DataFrame, c1: String, c2: String,
      bits: Int): (Column, Column) = {
    val r = df.agg(
      min(col(c1)).cast("long"), max(col(c1)).cast("long"),
      min(col(c2)).cast("long"), max(col(c2)).cast("long")).head()
    def mk(c: String, lo: Long, hi: Long): Column = {
      val span = math.max(hi - lo + 1, 1L)
      require(span <= (Long.MaxValue >> bits),
        s"z-order column $c: span $span * 2^$bits overflows Long — " +
          "use fewer bits or pre-scale the column")
      // floor((x - lo) * 2^bits / span), clamped to the top bucket
      least(
        (col(c).cast("long") - lit(lo)) * lit(1L << bits) / lit(span),
        lit((1L << bits) - 1)).cast("long")
    }
    (mk(c1, r.getLong(0), r.getLong(1)), mk(c2, r.getLong(2), r.getLong(3)))
  }

  /** Write `df` Z-ordered on (`c1`, `c2`): range-partition by the
    * Morton value of the min/max-scaled columns, sort within
    * partitions, write `numFiles` parquet files with narrow per-file
    * ranges in both columns. Returns nothing; measure locality with
    * [[fileRanges]]. */
  def writeZOrdered(df: DataFrame, c1: String, c2: String, path: String,
      numFiles: Int, bits: Int = 16): Unit = {
    val (s1, s2) = scaledBoth(df, c1, c2, bits)
    df.withColumn("_z", zValue(s1, s2, bits))
      .repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
      .write.mode("overwrite").parquet(path)
  }

  /** Per-file (min, max) width of a column in a written dataset — the
    * data-skipping figure of merit: a predicate on the column can prune
    * any file whose range excludes it, so smaller mean width ⇒ more
    * pruning. */
  def fileRanges(df: DataFrame, c: String): DataFrame =
    df.groupBy(input_file_name().as("file"))
      .agg((max(col(c)) - min(col(c))).cast("double").as("width"),
        count(lit(1)).as("rows"))

  /** Min/max cut index of a written dataset: one row per file with both
    * columns' bounds. At cluster scale this is computed ONCE at write
    * time and stored beside the data (a stats/manifest table — the
    * lakehouse pattern); here it's derived by a scan for the spec. */
  def statsIndex(df: DataFrame, c1: String, c2: String): DataFrame =
    df.groupBy(input_file_name().as("file"))
      .agg(min(col(c1)).as("min1"), max(col(c1)).as("max1"),
        min(col(c2)).as("min2"), max(col(c2)).as("max2"))

  /** File-skipping for a box predicate: the files whose [min,max]
    * envelope intersects the query box — the only files a reader must
    * open (the envelope check is conservative, so reading these and
    * applying the exact predicate equals the full scan). The index is
    * driver-sized (one row per file); the collect is of pruned PATHS,
    * not data. Z-ordering is what makes this list short. */
  def boxFiles(index: DataFrame,
      lo1: Long, hi1: Long, lo2: Long, hi2: Long): Seq[String] =
    index
      .filter(col("max1") >= lo1 && col("min1") <= hi1 &&
        col("max2") >= lo2 && col("min2") <= hi2)
      .select("file").collect().map(_.getString(0)).toIndexedSeq
}
