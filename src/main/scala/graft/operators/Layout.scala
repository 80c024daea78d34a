package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Physical data LAYOUT for scan locality — the lever that decides how
  * much of a 100 TB table a range query actually reads.
  *
  * Parquet readers skip data with per-row-group min/max statistics, but
  * stats only help when rows with nearby keys sit TOGETHER: a table
  * written from a hash-shuffled upstream spreads every key range over
  * every file, so every row group straddles the whole domain and no
  * predicate ever skips anything. [[writeRangeClustered]] is the
  * standard fix (Hive/Iceberg/Delta call it sort-clustering; z-order
  * generalizes it to multiple keys): range-repartition on the cluster
  * keys so each output file owns a narrow contiguous slice, then sort
  * within partitions so row groups inside each file are narrower still.
  * A `key BETWEEN lo AND hi` scan then reads the few files whose slice
  * intersects — the pushed predicate skips whole row groups of the
  * rest.
  *
  * repartitionByRange samples the data to pick boundaries (one extra
  * pass at write time — the cost a read-heavy table amortizes on the
  * first clustered query). The boundaries are data-dependent, so the
  * CONTENT contract (round-trip equality, range-aggregate equality) is
  * what the p16 gate hash-pins; the clustering property itself
  * (per-file key spans are narrow and nearly disjoint) is pinned by
  * LayoutSpec over the file footprint.
  */
object Layout {

  /** Write `df` to `path` range-clustered on `cols`: `files` output
    * files, each covering a narrow contiguous slice of the cluster-key
    * domain, rows sorted inside each file. */
  def writeRangeClustered(df: DataFrame, cols: Seq[String], path: String,
      files: Int): Unit = {
    require(cols.nonEmpty && files >= 1, "need cluster cols and files >= 1")
    df.repartitionByRange(files, cols.map(col): _*)
      .sortWithinPartitions(cols.map(col): _*)
      .write.mode("overwrite").parquet(path)
  }

  /** Compact a parquet table IN PLACE: read every file, rewrite as
    * `files` larger ones (range-clustered on `sortCols` when given,
    * hash-spread otherwise), and swap the directory. The maintenance
    * op every append-heavy table needs — [[SimilaritySearch.appendIndex]]
    * adds one file per touched partition per batch, daily ingest adds
    * one per job; a year of that is millions of tiny files whose
    * open/footer cost dominates scans long before data volume does.
    *
    * Swap protocol: write to `<path>_compacting`, rename the live dir
    * to `<path>_precompact`, rename the new dir in, delete the backup.
    * Plain-parquet honesty: the two renames are not one atomic commit —
    * run it in the table's single-writer maintenance window (the
    * snapshot-commit version of this op is what Iceberg/Delta exist
    * for; on those, compaction is a rewrite-files commit instead).
    * A crash between renames leaves `_precompact` intact for manual
    * restore; readers mid-swap can see a missing dir. A re-run after
    * such a crash REFUSES (leftover `_precompact`, or missing live
    * dir) rather than deleting the only remaining copies. */
  def compact(spark: org.apache.spark.sql.SparkSession, path: String,
      files: Int, sortCols: Seq[String] = Nil): Unit = {
    require(files >= 1, "files must be >= 1")
    swapInPlace(spark, path) { (df, tmp) =>
      // the clustered staging write IS writeRangeClustered — one recipe,
      // one place to change it
      if (sortCols.nonEmpty) writeRangeClustered(df, sortCols, tmp, files)
      else df.repartition(files).write.mode("overwrite").parquet(tmp)
    }
  }

  /** The guarded in-place swap [[compact]] uses, reusable by layout-
    * specific compactors (e.g. [[SimilaritySearch.compactIndex]], whose
    * staging write must preserve directory partitioning + a sidecar):
    * `write(currentTable, stagingPath)` rewrites the table into the
    * staging dir, then live → `_precompact`, staging → live, backup
    * deleted. Same crash-safety contract as [[compact]]: a re-run after
    * a half-finished swap REFUSES rather than deleting the only copies. */
  private[operators] def swapInPlace(
      spark: org.apache.spark.sql.SparkSession, path: String)(
      write: (DataFrame, String) => Unit): Unit = {
    // SIBLING staging dirs built from the normalized Path (not raw
    // string concat): a trailing-slash path would otherwise put
    // _compacting INSIDE the live table and the aside-rename — a dir
    // into its own child — always fails, leaving the rewrite as junk
    // inside the table
    val p = new org.apache.hadoop.fs.Path(path)
    require(p.getParent != null, s"compact: $path has no parent dir")
    val tmp = new org.apache.hadoop.fs.Path(p.getParent,
      p.getName + "_compacting")
    val bak = new org.apache.hadoop.fs.Path(p.getParent,
      p.getName + "_precompact")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // crash-safety guards BEFORE any delete: after a crash between the
    // two renames the live dir is gone and _precompact holds the only
    // copy — a blind re-run would delete both (the backup in cleanup,
    // then fail on the read) and lose the table. Refuse instead: a
    // leftover _precompact always means "restore manually first", and a
    // missing live dir means there is nothing safe to compact.
    require(!fs.exists(bak),
      s"compact: $bak exists — a previous compact did not finish; " +
        s"restore it over $p (or delete it after verifying $p) first")
    require(fs.exists(p), s"compact: $path does not exist")
    fs.delete(tmp, true)
    write(spark.read.parquet(path), tmp.toString)
    require(fs.rename(p, bak), s"compact: could not move $path aside")
    require(fs.rename(tmp, p), s"compact: could not install $tmp")
    fs.delete(bak, true)
    ()
  }

  /** Clustering-quality report of a parquet table: one row per file
    * with the (lo, hi) span of `keyCol` it holds — the evidence that a
    * layout is (or is not) range-clustered. File names are run-varying,
    * so this is spec/ops-side diagnostics, not gate output. */
  def fileSpans(df: DataFrame, keyCol: String): DataFrame =
    df.groupBy(input_file_name().as("file"))
      .agg(min(col(keyCol)).as("lo"), max(col(keyCol)).as("hi"),
        count(lit(1)).as("rows"))
}
