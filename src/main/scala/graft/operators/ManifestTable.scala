package graft.operators

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.{abs => fabs, col, explode,
  input_file_name, lit, max, min, sequence, sum => fsum, when}
import org.apache.spark.sql.types.StructType

/** Manifest-committed parquet table — the snapshot-commit layer that
  * closes [[Layout.compact]]'s one honesty gap: its directory swap is
  * two renames, so a reader mid-swap can see a missing dir and a crash
  * between them needs a manual restore. Here DATA FILES ARE IMMUTABLE
  * and visibility is a separate, single-rename commit:
  *
  *  - every write (create / append / compact) puts its parquet files in
  *    a fresh `c<uuid>/` subdir of the table path — invisible until
  *    referenced;
  *  - a manifest file `_manifest.<version>` lists the relative paths of
  *    ALL live data files for that snapshot, one per line;
  *  - commit writes the full manifest to a staged name and publishes it
  *    with ONE rename to `_manifest.<version>` — readers resolve the
  *    highest version, so they see the old file list or the new one,
  *    never a mix and never a missing table;
  *  - a crash at ANY point leaves only invisible garbage (data files and
  *    staged manifests no manifest references) — the next write and all
  *    readers ignore it, [[vacuum]] deletes it. No restore step exists
  *    because no step ever unpublishes the current snapshot.
  *
  * This is the minimal member of the manifest-table family (Iceberg /
  * Delta / Hive ACID are the production members — snapshot isolation
  * plus schema evolution, stats and OCC on top of the same idea; the
  * reference's analog is its single-transaction bulk load,
  * `database_service.py:292-294`).
  *
  * Atomicity contract: publish is `FileSystem.rename` of a fully-written
  * file within one directory — atomic on HDFS and POSIX. HDFS rename
  * also refuses an existing target, making concurrent commits safe
  * there; raw-local rename(2) REPLACES the target, so [[commit]] adds a
  * per-table JVM mutex that CLOSES the two-writer race for every writer
  * in one process (the normal single-driver topology — and all of
  * `local[*]`); losers surface as [[ConcurrentCommitException]] for
  * [[retryOnConflict]]. Only separate PROCESSES racing on a raw local
  * FS remain narrowed-not-closed (exact on HDFS) — single-writer
  * maintenance windows are exact everywhere, and readers are always
  * safe: a reader that catches a non-atomic local replace mid-read
  * detects it by the header's file count (the torn-manifest self-check
  * in [[readSnapshot]]) and fails loudly. Scale shape: a
  * manifest is one line per file — a 100 TB table at healthy file
  * sizes is ~10⁵ lines, a driver-side read; the data plane never moves
  * through the manifest.
  *
  * Retention doubles as TIME TRAVEL: superseded manifests stay on disk
  * until [[vacuum]], and `read(path, version = Some(v))` resolves
  * exactly snapshot v — the "which snapshot trained model X"
  * reproducibility read. Deletes come in both real-world shapes:
  * [[deleteRange]] (contiguous) and [[deleteIds]] (scattered id sets),
  * both file-level copy-on-write through the same stats pruning.
  */
object ManifestTable {

  /** A commit lost the optimistic-concurrency race: the table moved
    * past the snapshot the writer planned against (or the target
    * manifest already exists). Extends IllegalArgumentException so
    * callers treating conflicts as plain failures keep working; typed
    * so [[retryOnConflict]] can retry EXACTLY this — a data error must
    * never be retried into place. Nothing is partially committed when
    * this is thrown (the staged manifest is crash debris, vacuumed). */
  final class ConcurrentCommitException(msg: String)
    extends IllegalArgumentException(msg)

  /** The sanctioned multi-writer append pattern: re-run `body` (which
    * must RE-READ the current snapshot inside itself — every public
    * write here does) when it loses the commit race, up to
    * `maxAttempts`. Rebasing by re-run is safe for appends and other
    * self-contained writes because each attempt replans against the
    * NEW snapshot; blind manifest-list rebase (what commit refuses)
    * would not be. Maintenance (compact/vacuum) should stay
    * single-writer rather than retry. */
  def retryOnConflict[T](maxAttempts: Int = 3)(body: => T): T = {
    require(maxAttempts >= 1, "maxAttempts must be >= 1")
    var attempt = 1
    while (true) {
      try return body catch {
        case _: ConcurrentCommitException if attempt < maxAttempts =>
          attempt += 1
      }
    }
    sys.error("unreachable")
  }

  private val ManifestName = """_manifest\.(\d+)""".r

  /** A manifest line: the file's relative path plus its per-column
    * (min, max) stats when the writer declared `statsCols`. Serialized
    * as `rel/path|col:lo:hi|col2:lo:hi` — stats values are LONGS (the
    * repo-wide fixed-point discipline: ids, epoch days, cents; cast or
    * pre-scale non-integer columns), so parsing is trivial and the
    * envelope check is exact integer arithmetic. A line without stats
    * is just the path — readers treat such files as "always
    * intersects" (conservative), so stats-less and stats-carrying
    * files mix freely in one table. */
  final case class ManifestEntry(path: String,
      stats: Map[String, (Long, Long)])

  private def parseEntry(line: String): ManifestEntry = {
    val parts = line.split('|')
    val stats = parts.drop(1).flatMap { s =>
      s.split(':') match {
        case Array(c, lo, hi) => Some(c -> (lo.toLong, hi.toLong))
        case _                => None
      }
    }.toMap
    ManifestEntry(parts.head, stats)
  }

  private def fsOf(spark: SparkSession, path: String): (FileSystem, Path) = {
    val p = new Path(path)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  /** Resolve a manifest entry's file against the table base. Entries
    * this table's own writes commit are RELATIVE; a [[shallowClone]]'s
    * first manifest holds ABSOLUTE paths into the source table — those
    * resolve as themselves. Vacuum stays safe by construction either
    * way: it only ever deletes files physically under ITS OWN table
    * directory, which absolute foreign entries never are. */
  private def resolveFile(base: Path, file: String): Path = {
    val p = new Path(file)
    if (p.isAbsolute) p else new Path(base, file)
  }

  /** One fully-parsed manifest: entry lines, the idempotence tag it
    * committed under, and the snapshot's schema DDL (recorded since r15
    * so an EMPTY snapshot — a delete that removed every row — still
    * reads as a typed empty frame instead of bricking the table). */
  private final case class Snapshot(version: Long, lines: Seq[String],
      txn: Option[String], schemaDdl: Option[String],
      op: Option[String] = None,
      constraints: Seq[(String, String)] = Nil)

  private val HeaderCount = """# graft manifest v\d+, (\d+) files""".r

  /** Parse `_manifest.<v>` with the torn-manifest self-check: the
    * header records the file count at write, so a reader that opens a
    * manifest a non-atomic local-FS writer replaced mid-read (rename(2)
    * REPLACES the target — the documented local-FS corner) detects the
    * truncation by count and fails loudly instead of silently serving a
    * partial snapshot. Headerless manifests (hand-written/foreign) skip
    * the check — there is nothing to validate against. */
  private def readSnapshot(fs: FileSystem, p: Path, v: Long): Snapshot = {
    val m = new Path(p, s"_manifest.$v")
    val in = fs.open(m)
    val body = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
    val all = body.linesIterator.map(_.trim).filter(_.nonEmpty).toSeq
    val entries = all.filterNot(_.startsWith("#"))
    all.headOption match {
      case Some(HeaderCount(n)) =>
        require(entries.size == n.toInt,
          s"manifest $m is torn/truncated: header declares $n files, " +
            s"found ${entries.size} — a non-atomic writer replaced it " +
            "mid-read; retry the read or restore the manifest")
      case _ => // no header: nothing to validate against
    }
    val txn = all.collectFirst {
      case l if l.startsWith("# txn ") => l.stripPrefix("# txn ").trim
    }
    val schema = all.collectFirst {
      case l if l.startsWith("# schema ") => l.stripPrefix("# schema ").trim
    }
    val op = all.collectFirst {
      case l if l.startsWith("# op ") => l.stripPrefix("# op ").trim
    }
    val constraints = all.collect {
      case l if l.startsWith("# constraint ") =>
        val body = l.stripPrefix("# constraint ").trim
        val cut = body.indexOf(' ')
        (body.substring(0, cut), body.substring(cut + 1).trim)
    }
    Snapshot(v, entries, txn, schema, op, constraints)
  }

  /** Retained manifest versions, ascending; Nil when the table does
    * not exist. The lower end moves up as [[vacuum]] reclaims. */
  def versions(spark: SparkSession, path: String): Seq[Long] = {
    val (fs, p) = fsOf(spark, path)
    if (!fs.exists(p)) return Nil
    fs.listStatus(p).iterator.flatMap { st =>
      st.getPath.getName match {
        case ManifestName(v) => Some(v.toLong)
        case _               => None
      }
    }.toSeq.sorted
  }

  /** The newest snapshot; None when no manifest exists. */
  private def currentSnapshot(spark: SparkSession,
      path: String): Option[Snapshot] = {
    val vs = versions(spark, path)
    if (vs.isEmpty) None
    else {
      val (fs, p) = fsOf(spark, path)
      Some(readSnapshot(fs, p, vs.max))
    }
  }

  /** The snapshot at `version`, failing loudly when it was vacuumed or
    * never committed (the reproducibility contract: a caller asking for
    * a specific historical snapshot must never silently get another). */
  private def snapshotAt(spark: SparkSession, path: String,
      version: Long): Snapshot = {
    val (fs, p) = fsOf(spark, path)
    val m = new Path(p, s"_manifest.$version")
    require(fs.exists(m),
      s"manifest table $path: version $version is not retained " +
        s"(vacuumed or never committed); retained: " +
        s"${versions(spark, path).mkString(", ")}")
    readSnapshot(fs, p, version)
  }

  /** (version, raw manifest lines) of the current snapshot; (0, Nil)
    * when no manifest exists. Lines are the serialized [[ManifestEntry]]
    * form — [[currentManifest]]/[[currentEntries]] are the parsed views. */
  private def currentLines(spark: SparkSession,
      path: String): (Long, Seq[String]) =
    currentSnapshot(spark, path)
      .map(s => (s.version, s.lines)).getOrElse((0L, Nil))

  /** (version, relative data-file paths) of the current snapshot;
    * (0, Nil) when no manifest exists. */
  def currentManifest(spark: SparkSession, path: String): (Long, Seq[String]) = {
    val (v, lines) = currentLines(spark, path)
    (v, lines.map(parseEntry(_).path))
  }

  /** (version, parsed entries with per-file stats) of the current
    * snapshot — the input to manifest-side pruning ([[readRange]]). */
  def currentEntries(spark: SparkSession,
      path: String): (Long, Seq[ManifestEntry]) = {
    val (v, lines) = currentLines(spark, path)
    (v, lines.map(parseEntry))
  }

  /** Entries of the requested snapshot (current when `version` is
    * None) — the pruned reads are version-aware like [[read]]. */
  private def entriesOf(spark: SparkSession, path: String,
      version: Option[Long]): (Long, Seq[ManifestEntry]) =
    version match {
      case Some(ver) =>
        (ver, snapshotAt(spark, path, ver).lines.map(parseEntry))
      case None => currentEntries(spark, path)
    }

  /** Metadata-only row count: every write that records stats also
    * records the file's row count (`__rows`), so counting a
    * stats-carrying table is a driver-side sum over the manifest — no
    * file opens at all (the `SELECT count(*)` a 100 TB table answers
    * from metadata). Falls back to a data count when any file predates
    * the stat or the table never carried stats. */
  def countRows(spark: SparkSession, path: String,
      version: Option[Long] = None): Long = {
    val (v, entries) = entriesOf(spark, path, version)
    require(v > 0, s"manifest table $path does not exist")
    val counts = entries.map(_.stats.get(RowsStat).map(_._1))
    if (counts.nonEmpty && counts.forall(_.isDefined))
      counts.flatten.sum
    else read(spark, path, version = version).count()
  }

  /** Reserved manifest-stat key carrying the file's row count. */
  private val RowsStat = "__rows"

  /** Ceiling on the literal `isin` rewrite filter in [[upsert]]/
    * [[merge]]: collected key sets up to this size become a codegen'd
    * InSet anti-filter (no join, no second source pass); past it the
    * plan-side cost of an N-literal `In` tree (driver construction,
    * serialization, explain output) outgrows what the broadcast
    * anti-join costs, so the anti-join path takes over. Exact per-file
    * ENVELOPE pruning still uses the full collected set either way —
    * this caps only the filter's literal form. */
  private val MaxInSetLiterals = 8192

  /** The table as a DataFrame. Resolves ONLY manifest-listed files —
    * orphan parquet in the directory (crashed writers, not-yet-
    * committed appends, pre-vacuum compaction leftovers) is invisible.
    *
    * `version`: time-travel read. `None` (default) resolves the newest
    * manifest; `Some(v)` reads EXACTLY snapshot v — superseded
    * manifests and their data files stay on disk until [[vacuum]]
    * (`keepVersions`, default 2), so "which exact snapshot trained
    * model X" is answerable as long as retention covers it. A vacuumed
    * or never-committed version fails loudly, never silently serves a
    * neighbor. This is the read half of the reproducibility contract
    * (the reference's analog is the count-what-was-there-first backfill
    * guard, `database_service.py:443-450`).
    *
    * An EMPTY snapshot (a delete removed every row) reads as an empty
    * frame with the schema the commit recorded in the manifest header —
    * a legal API sequence must not brick the table for readers.
    *
    * Schema: by default Spark takes it from a sample of footers — cheap,
    * correct while every commit writes the same columns. After a
    * schema-evolving append (new column on new files), pass
    * `mergeSchema = true` to union all footers (src04's parquet
    * contract: old files read the new column as NULL); it costs a
    * footer read per file at planning, so reserve it for evolved
    * tables — or compact once and the schema is uniform again. */
  def read(spark: SparkSession, path: String,
      mergeSchema: Boolean = false,
      version: Option[Long] = None): DataFrame = {
    val snap = version match {
      case Some(ver) => snapshotAt(spark, path, ver)
      case None =>
        val s = currentSnapshot(spark, path)
        require(s.isDefined,
          s"manifest table $path does not exist (no _manifest.N)")
        s.get
    }
    val files = snap.lines.map(parseEntry(_).path)
    if (files.isEmpty) {
      require(snap.schemaDdl.isDefined,
        s"manifest table $path: v${snap.version} lists no files and " +
          "records no schema (pre-r15 manifest) — cannot type an empty read")
      return spark.createDataFrame(
        java.util.Collections.emptyList[Row](),
        StructType.fromDDL(snap.schemaDdl.get))
    }
    val base = new Path(path)
    spark.read.option("mergeSchema", mergeSchema.toString)
      .parquet(files.map(f => resolveFile(base, f).toString): _*)
  }

  /** Create the table: write `df` as the first snapshot. Refuses if a
    * manifest already exists (use [[append]]/[[compact]] to evolve).
    * `statsCols` (long-castable) get per-file (min, max) recorded in
    * the manifest — see [[readRange]]. */
  def create(spark: SparkSession, path: String, df: DataFrame,
      files: Int, sortCols: Seq[String] = Nil,
      statsCols: Seq[String] = Nil, txn: Option[String] = None,
      zOrder: Boolean = false): Long = {
    val (v0, _) = currentLines(spark, path)
    require(v0 == 0L, s"manifest table $path already exists (v$v0)")
    val added = writeDataFiles(spark, path, df, files, sortCols, statsCols,
      zOrder)
    commit(spark, path, added, expectedCurrent = 0L, txn = txn,
      schemaDdl = Some(df.schema.toDDL), op = "create")
  }

  /** Append `df` as new immutable files; the new snapshot lists the old
    * files plus the new ones. Running readers keep the old snapshot.
    *
    * `txn` is the idempotence tag for replayed writers (a Structured
    * Streaming batchId, an orchestrator run id): when it equals the tag
    * the CURRENT manifest committed under, the append is a NO-OP
    * returning the current version — the caller already committed and
    * crashed before recording it. Checking only the current manifest is
    * sufficient for monotonic writers (streaming replays only the
    * latest uncommitted batch — the transactional-sink argument); it is
    * NOT a general dedup ledger. */
  def append(spark: SparkSession, path: String, df: DataFrame,
      files: Int, statsCols: Seq[String] = Nil,
      txn: Option[String] = None, sortCols: Seq[String] = Nil): Long = {
    val (v, current) = currentLines(spark, path)
    require(v > 0, s"manifest table $path does not exist")
    if (txn.isDefined && lastTxn(spark, path) == txn) return v
    enforceConstraints(spark, path, df, "append")
    // sortCols: range-cluster the appended files on the table's key
    // (Iceberg's write.distribution-mode=range) — appends that each
    // span the whole key domain defeat every later envelope-pruned
    // read/CoW of the table, however well created files were clustered
    val added = writeDataFiles(spark, path, df, files, sortCols, statsCols)
    // an untagged write still carries a prior streaming tag forward —
    // same argument as maintenance (see lastTxn): erasing it would let
    // a crash-replay readmit an already-committed batch
    commit(spark, path, current ++ added, expectedCurrent = v,
      txn = txn.orElse(lastTxn(spark, path)),
      schemaDdl = Some(df.schema.toDDL), op = "append")
  }

  /** The idempotence tag the current manifest committed under, if any.
    * Maintenance commits ([[compact]], [[deleteRange]], [[deleteIds]])
    * CARRY the tag FORWARD — a replayed streaming batch must still
    * no-op after a compaction interleaved with its replay window
    * (otherwise crash-after-commit + compact + replay = duplicate
    * rows; the exactly-once contract of
    * [[graft.streaming.StreamingEtl.writeBatchManifest]]). */
  def lastTxn(spark: SparkSession, path: String): Option[String] =
    currentSnapshot(spark, path).flatMap(_.txn)

  /** Rewrite the current snapshot as `files` larger files (range-
    * clustered on `sortCols` when given) and commit the replacement
    * list with one rename. The old files stay on disk — still served to
    * any reader that resolved the previous manifest — until [[vacuum]].
    * This is [[Layout.compact]] without the maintenance window. */
  def compact(spark: SparkSession, path: String, files: Int,
      sortCols: Seq[String] = Nil, statsCols: Seq[String] = Nil,
      zOrder: Boolean = false): Long = {
    val (v, lines) = currentLines(spark, path)
    require(v > 0, s"manifest table $path does not exist")
    // mergeSchema ALWAYS on the rewrite read: a schema-evolved table
    // whose footer sample missed the new column would otherwise be
    // rewritten WITHOUT it — silent data loss. Compaction reads every
    // file anyway; the per-footer planning cost is already paid.
    val src = read(spark, path, mergeSchema = true)
    val rewritten = writeDataFiles(spark, path, src, files,
      sortCols, inheritStats(statsCols, lines), zOrder)
    // carry the txn tag forward (see lastTxn): maintenance must not
    // erase a streaming writer's idempotence marker
    commit(spark, path, rewritten, expectedCurrent = v,
      txn = lastTxn(spark, path), schemaDdl = Some(src.schema.toDDL), op = "compact")
  }

  /** Stats columns are a TABLE property: maintenance rewrites
    * (compact, deleteRange) keep recording whatever the current
    * manifest records unless the caller overrides — a routine compact
    * must not silently degrade every future pruned read to
    * conservative full-list scans. */
  private def inheritStats(statsCols: Seq[String],
      lines: Seq[String]): Seq[String] =
    if (statsCols.nonEmpty) statsCols
    else lines.flatMap(parseEntry(_).stats.keys)
      .filterNot(_ == RowsStat).distinct.sorted

  /** INCREMENTAL compaction: fold only the files smaller than
    * `minBytes` into `files` consolidated ones, leaving every
    * well-sized file's bytes and manifest line untouched — the only
    * compaction shape that works at 100 TB, where a full [[compact]]
    * rewrite of the table is off the table and the thing that actually
    * fragments is the small-file TAIL a streaming sink or frequent
    * small appends leave behind. The size check is one driver-side
    * `getFileStatus` per manifest line (metadata, no file opens);
    * cost is proportional to the small tail, never the table. With
    * fewer than two small files there is nothing to fold — returns
    * the current version, commits nothing (so a maintenance loop can
    * call it unconditionally). One snapshot commit; txn carried like
    * all maintenance ([[lastTxn]]); the pre-compaction snapshot stays
    * readable until [[vacuum]]. */
  def compactSmall(spark: SparkSession, path: String, minBytes: Long,
      files: Int = 1, sortCols: Seq[String] = Nil,
      statsCols: Seq[String] = Nil): Long = {
    require(minBytes > 0, "compactSmall: minBytes must be positive")
    val (v, lines) = currentLines(spark, path)
    require(v > 0, s"manifest table $path does not exist")
    val (fs, _) = fsOf(spark, path)
    val base = new Path(path)
    val (small, big) = lines.partition { l =>
      fs.getFileStatus(resolveFile(base, parseEntry(l).path))
        .getLen < minBytes
    }
    if (small.size <= 1) return v // already optimal: no-op, no commit
    val df = spark.read.option("mergeSchema", "true")
      .parquet(small.map(l =>
        resolveFile(base, parseEntry(l).path).toString): _*)
    val rewritten = writeDataFiles(spark, path, df, files, sortCols,
      inheritStats(statsCols, lines))
    commit(spark, path, big ++ rewritten, expectedCurrent = v,
      txn = lastTxn(spark, path), schemaDdl = Some(df.schema.toDDL), op = "compact-small")
  }

  /** Two-predicate box read through manifest-side pruning: keep only
    * the files whose stats envelopes intersect BOTH ranges (a missing
    * stat keeps the file — conservative per axis) and apply the exact
    * predicates to just those. On a [[create]]d `zOrder = true` layout
    * every file is narrow in both columns, so either predicate alone
    * prunes most files and their conjunction prunes multiplicatively —
    * the manifest-resident version of [[ZOrder.boxFiles]] (no stats
    * scan at query time: the envelopes were recorded at write). */
  def readBox(spark: SparkSession, path: String,
      c1: String, lo1: Long, hi1: Long,
      c2: String, lo2: Long, hi2: Long,
      version: Option[Long] = None): DataFrame = {
    require(lo1 <= hi1 && lo2 <= hi2, "readBox: lo > hi")
    val (v, entries) = entriesOf(spark, path, version)
    require(v > 0, s"manifest table $path does not exist")
    val base = new Path(path)
    def hits(e: ManifestEntry, c: String, lo: Long, hi: Long) =
      e.stats.get(c).forall { case (flo, fhi) => fhi >= lo && flo <= hi }
    val keep = entries.filter(e =>
      hits(e, c1, lo1, hi1) && hits(e, c2, lo2, hi2))
    if (keep.isEmpty)
      return read(spark, path, version = version).filter(lit(false))
    spark.read.parquet(keep.map(e => resolveFile(base, e.path).toString): _*)
      .filter(col(c1).cast("long").between(lo1, hi1) &&
        col(c2).cast("long").between(lo2, hi2))
  }

  /** Copy-on-write range DELETE: remove every row with `c` in
    * [lo, hi], rewriting ONLY the files whose stats envelope intersects
    * the range — files provably outside it keep their exact bytes and
    * manifest lines (at 100 TB a targeted delete touches the few files
    * holding the range, not the table; the right-to-be-forgotten shape
    * for a training corpus). Files without stats for `c` are rewritten
    * conservatively. One commit publishes the new snapshot; the old
    * files serve in-flight readers until [[vacuum]]. Rewritten files
    * get fresh stats for `statsCols` (pass the create-time columns to
    * keep future deletes/reads pruned). Returns the committed version
    * (the current one unchanged when no file intersects). Rewritten
    * files are hash-spread (clustering degrades locally after many
    * deletes); a `compact(..., zOrder = true)` commit restores the
    * layout — no maintenance window needed. */
  def deleteRange(spark: SparkSession, path: String, c: String,
      lo: Long, hi: Long, statsCols: Seq[String] = Nil): Long = {
    require(lo <= hi, s"deleteRange: lo $lo > hi $hi")
    val (v, lines) = currentLines(spark, path)
    require(v > 0, s"manifest table $path does not exist")
    val base = new Path(path)
    val (touched, untouched) = lines.partition { l =>
      parseEntry(l).stats.get(c)
        .forall { case (flo, fhi) => fhi >= lo && flo <= hi }
    }
    if (touched.isEmpty) return v
    // mergeSchema for the same reason as compact(): rewriting evolved
    // files through a sampled schema would silently drop a new column.
    // NULL (and cast-failed) rows are KEPT explicitly: NULL is in no
    // range, and `!between` alone evaluates to NULL on them — a bare
    // negation would silently delete every NULL-c row in rewritten
    // files (schema-evolved tables read old files' new column as NULL).
    val survivors = spark.read.option("mergeSchema", "true")
      .parquet(touched.map(l =>
        resolveFile(base, parseEntry(l).path).toString): _*)
      .filter(col(c).cast("long").isNull ||
        !col(c).cast("long").between(lo, hi))
    val rewritten = writeDataFiles(spark, path, survivors,
      files = touched.size, Nil, inheritStats(statsCols, lines))
    commit(spark, path, untouched ++ rewritten, expectedCurrent = v,
      txn = lastTxn(spark, path), schemaDdl = Some(survivors.schema.toDDL), op = "delete-range")
  }

  /** Copy-on-write id-set DELETE: remove every row whose `c` is in
    * `ids` — the shape real right-to-be-forgotten requests arrive in
    * (scattered document ids, not one contiguous range). File pruning
    * is exact against the manifest stats: a file is rewritten only when
    * AT LEAST ONE id falls inside its [min, max] envelope (binary
    * search per file over the sorted set — driver-side, O(files · log
    * ids)); files without stats for `c` rewrite conservatively. On an
    * id-clustered layout a scattered-but-local set touches few files.
    * The survivor filter is an `IN`-set test (Catalyst turns it into a
    * hash-set `InSet` above the conversion threshold — O(1) per row);
    * NULL / cast-failed rows are KEPT (membership of NULL in any set is
    * false for deletion purposes, same contract as [[deleteRange]]).
    * For id sets beyond what a broadcast literal set should carry
    * (~10⁷), stage the ids as a table and anti-join instead. Returns
    * the committed version (unchanged when no envelope holds any id). */
  def deleteIds(spark: SparkSession, path: String, c: String,
      ids: Seq[Long], statsCols: Seq[String] = Nil): Long = {
    require(ids.nonEmpty, "deleteIds: empty id set")
    val (v, lines) = currentLines(spark, path)
    require(v > 0, s"manifest table $path does not exist")
    val base = new Path(path)
    val sorted = ids.distinct.sorted.toArray
    def anyIn(lo: Long, hi: Long): Boolean = {
      var i = java.util.Arrays.binarySearch(sorted, lo)
      if (i < 0) i = -i - 1
      i < sorted.length && sorted(i) <= hi
    }
    val (touched, untouched) = lines.partition { l =>
      parseEntry(l).stats.get(c)
        .forall { case (flo, fhi) => anyIn(flo, fhi) }
    }
    if (touched.isEmpty) return v
    val survivors = spark.read.option("mergeSchema", "true")
      .parquet(touched.map(l =>
        resolveFile(base, parseEntry(l).path).toString): _*)
      .filter(col(c).cast("long").isNull ||
        !col(c).cast("long").isin(sorted.toSeq: _*))
    val rewritten = writeDataFiles(spark, path, survivors,
      files = touched.size, Nil, inheritStats(statsCols, lines))
    commit(spark, path, untouched ++ rewritten, expectedCurrent = v,
      txn = lastTxn(spark, path), schemaDdl = Some(survivors.schema.toDDL), op = "delete-ids")
  }

  /** Copy-on-write MERGE (upsert) keyed on long-castable `c`: rows of
    * `updates` REPLACE every current row sharing their key; keys absent
    * from the table are inserted. One commit publishes the result.
    *
    * File pruning is two-tier: when the update key set is small enough
    * to collect (`<= maxCollectedKeys` distinct keys — one countDistinct
    * scalar decides), pruning is EXACT per file (binary search of the
    * sorted set against each envelope, the [[deleteIds]] discipline);
    * a larger update prunes by the updates' global [min, max] envelope
    * only — coarser (an envelope-intersecting file may hold no update
    * key) but never incorrect, because the survivor filter is a
    * LEFT ANTI JOIN against the update keys, not a literal set: it
    * scales to arbitrarily large updates and keeps NULL-keyed rows
    * (NULL never equi-joins — the same NULL contract as the deletes).
    * Files without stats for `c` rewrite conservatively.
    *
    * The rewrite unions survivors with the updates and writes them as
    * `files` fresh files; untouched files keep their exact bytes and
    * manifest lines. Multi-row keys follow DELETE-then-INSERT
    * semantics: ALL current rows of an updated key are replaced by
    * exactly the update's rows for that key (the natural contract when
    * a key is a document/order and its rows are parts). `txn` is the
    * replay-idempotence tag ([[append]]). */
  def upsert(spark: SparkSession, path: String, c: String,
      updates: DataFrame, files: Int, statsCols: Seq[String] = Nil,
      txn: Option[String] = None,
      maxCollectedKeys: Long = 100000L): Long = {
    val (v, lines) = currentLines(spark, path)
    require(v > 0, s"manifest table $path does not exist")
    if (txn.isDefined && lastTxn(spark, path) == txn) return v
    enforceConstraints(spark, path, updates, "upsert")
    val base = new Path(path)
    val keyCol = col(c).cast("long")
    val (kLo, kHi, exactKeys) = keyProfile(updates, keyCol,
      maxCollectedKeys, "upsert: updates carry no non-NULL keys")
    def fileTouched(stats: Option[(Long, Long)]): Boolean = stats match {
      case None => true // no envelope: conservative
      case Some((flo, fhi)) => exactKeys match {
        case Some(ks) =>
          var i = java.util.Arrays.binarySearch(ks, flo)
          if (i < 0) i = -i - 1
          i < ks.length && ks(i) <= fhi
        case None => fhi >= kLo && flo <= kHi
      }
    }
    val (touched, untouched) = lines.partition(l =>
      fileTouched(parseEntry(l).stats.get(c)))
    // With the exact key set already collected (keyProfile), the
    // delete-matched step is a codegen'd InSet anti-filter — the
    // deleteIds shape: no join, no shuffle, and no re-computation of
    // the updates frame for its key side. Past the cap it stays the
    // anti-join. NULL keys survive either way (NULL is in no set).
    val survivors =
      if (touched.isEmpty) None
      else {
        val cand = spark.read.option("mergeSchema", "true")
          .parquet(touched.map(l =>
            resolveFile(base, parseEntry(l).path).toString): _*)
        Some(exactKeys match {
          case Some(ks) if ks.length <= MaxInSetLiterals =>
            cand.filter(keyCol.isNull || !keyCol.isin(ks.toSeq: _*))
          case _ => cand.join(updates.select(keyCol.as("__k"))
            .where(col("__k").isNotNull).distinct(),
            keyCol === col("__k"), "left_anti")
        })
      }
    val rewriteDf = survivors match {
      case Some(s) => s.unionByName(updates, allowMissingColumns = true)
      case None    => updates
    }
    val rewritten = writeDataFiles(spark, path, rewriteDf,
      files = math.max(files, touched.size), Nil,
      inheritStats(statsCols, lines))
    commit(spark, path, untouched ++ rewritten, expectedCurrent = v,
      txn = txn.orElse(lastTxn(spark, path)),
      schemaDdl = Some(rewriteDf.schema.toDDL), op = "upsert")
  }

  /** Generalized copy-on-write MERGE keyed on long-castable `c` —
    * [[upsert]] is the (replace, insert) corner of this matrix:
    *
    *  - `whenMatched`: what happens to CURRENT rows whose key appears
    *    in `source`: "replace" (delete-then-insert per key, the upsert
    *    contract), "delete" (matched keys' rows removed), or "keep"
    *    (current rows untouched — NO file rewrites at all).
    *  - `whenNotMatched`: source rows whose key is NOT in the table:
    *    "insert" or "ignore".
    *
    * (keep, insert) is the IDEMPOTENT-INGEST primitive a training
    * corpus needs: add only genuinely NEW keys, skip re-deliveries
    * wholesale — no rewrite, I/O = source plus ONE key-scan of the
    * envelope-candidate slice, and re-merging an already-ingested
    * source is a no-op that commits nothing. (delete, ignore) is the
    * DataFrame-keyed delete — [[deleteIds]] without the driver-side id
    * list, for id sets that only exist distributed. (replace, ignore)
    * updates existing keys only. Pruning (exact key set when
    * collectable, envelope otherwise), NULL-row survival, and txn
    * replay no-ops are [[upsert]]'s. */
  def merge(spark: SparkSession, path: String, c: String,
      source: DataFrame, files: Int,
      whenMatched: String = "replace", whenNotMatched: String = "insert",
      statsCols: Seq[String] = Nil, txn: Option[String] = None,
      maxCollectedKeys: Long = 100000L): Long = {
    require(Set("replace", "delete", "keep")(whenMatched),
      s"merge: whenMatched '$whenMatched' not in replace|delete|keep")
    require(Set("insert", "ignore")(whenNotMatched),
      s"merge: whenNotMatched '$whenNotMatched' not in insert|ignore")
    require(whenMatched != "keep" || whenNotMatched == "insert",
      "merge(keep, ignore) does nothing — refuse rather than no-op")
    if (whenMatched == "replace" && whenNotMatched == "insert")
      return upsert(spark, path, c, source, files, statsCols, txn,
        maxCollectedKeys)
    val (v, lines) = currentLines(spark, path)
    require(v > 0, s"manifest table $path does not exist")
    if (txn.isDefined && lastTxn(spark, path) == txn) return v
    val base = new Path(path)
    val keyCol = col(c).cast("long")
    val (kLo, kHi, exactKeys) = keyProfile(source, keyCol,
      maxCollectedKeys, "merge: source carries no non-NULL keys")
    def fileTouched(stats: Option[(Long, Long)]): Boolean = stats match {
      case None => true
      case Some((flo, fhi)) => exactKeys match {
        case Some(ks) =>
          var i = java.util.Arrays.binarySearch(ks, flo)
          if (i < 0) i = -i - 1
          i < ks.length && ks(i) <= fhi
        case None => fhi >= kLo && flo <= kHi
      }
    }
    val (touched, untouched) = lines.partition(l =>
      fileTouched(parseEntry(l).stats.get(c)))
    val candidates: Option[DataFrame] =
      if (touched.isEmpty) None
      else Some(spark.read.option("mergeSchema", "true")
        .parquet(touched.map(l =>
          resolveFile(base, parseEntry(l).path).toString): _*))
    // the candidate slice's distinct keys classify the source rows;
    // keys outside every envelope are new by construction
    def tgtKeys(cand: DataFrame): DataFrame =
      cand.select(keyCol.as("__tk")).where(col("__tk").isNotNull)
        .distinct()
    def notMatchedSrc: DataFrame = candidates match {
      case None       => source
      case Some(cand) =>
        source.join(tgtKeys(cand), keyCol === col("__tk"), "left_anti")
    }
    def matchedSrc: DataFrame = candidates match {
      case None       => source.limit(0)
      case Some(cand) =>
        source.join(tgtKeys(cand), keyCol === col("__tk"), "left_semi")
    }
    val carriedTxn = txn.orElse(lastTxn(spark, path))
    whenMatched match {
      case "keep" => // insert-only: never rewrite, possibly no-op
        // Write-first, decide-after: the pre-r15 shape ran the
        // not-matched anti-join TWICE (`ins.isEmpty`, then the write
        // recomputed it). Writing once and reading emptiness off the
        // committed-to-be lines' row counts (free with footer stats)
        // halves the source passes; an empty or refused write leaves
        // only invisible staging debris (the crash contract), which is
        // deleted here anyway.
        val ins = notMatchedSrc
        val added = writeDataFiles(spark, path, ins, files, Nil,
          inheritStats(statsCols, lines))
        val (fs, _) = fsOf(spark, path)
        def dropStaged(): Unit = added.headOption
          .map(l => parseEntry(l).path.split('/').head)
          .foreach(sub => fs.delete(new Path(base, sub), true))
        // best-effort cleanup that must NOT mask the refusal it follows:
        // a failing filesystem delete is recorded as suppressed, the
        // original constraint violation still propagates
        def dropStagedQuietly(cause: Throwable): Unit =
          try dropStaged()
          catch { case scala.util.control.NonFatal(e) =>
            cause.addSuppressed(e) }
        if (writtenRows(spark, path, added) == 0L) {
          dropStaged() // no new keys: metadata no-op, same version back
          return v
        }
        // constraints check the WRITTEN slice (cheaper than re-running
        // the anti-join on the source); a violation drops the staged
        // files and refuses before anything commits
        try enforceConstraints(spark, path,
          spark.read.parquet(added.map(l =>
            resolveFile(base, parseEntry(l).path).toString): _*), "merge")
        catch { case e: Throwable => dropStagedQuietly(e); throw e }
        commit(spark, path, lines ++ added, expectedCurrent = v,
          txn = carriedTxn, schemaDdl = Some(ins.schema.toDDL), op = "merge")
      case m => // delete | replace(+ignore): CoW rewrite of candidates
        if (touched.isEmpty && whenNotMatched == "ignore") return v
        // InSet anti-filter when the exact keys are in hand (see
        // upsert): removes the anti-join AND the source re-scan that
        // built its key side
        val survivors = candidates.map(cand => exactKeys match {
          case Some(ks) if ks.length <= MaxInSetLiterals =>
            cand.filter(keyCol.isNull || !keyCol.isin(ks.toSeq: _*))
          case _ => cand.join(source.select(keyCol.as("__k"))
            .where(col("__k").isNotNull).distinct(),
            keyCol === col("__k"), "left_anti")
        })
        val incoming =
          if (m == "replace") Some(matchedSrc)
          else if (whenNotMatched == "insert") Some(notMatchedSrc)
          else None
        incoming.foreach(enforceConstraints(spark, path, _, "merge"))
        val rewriteDf = (survivors, incoming) match {
          case (Some(s), Some(i)) =>
            s.unionByName(i, allowMissingColumns = true)
          case (Some(s), None) => s
          case (None, Some(i)) => i
          case (None, None)    => return v // nothing to do
        }
        val rewritten = writeDataFiles(spark, path, rewriteDf,
          files = math.max(files, touched.size), Nil,
          inheritStats(statsCols, lines))
        commit(spark, path, untouched ++ rewritten, expectedCurrent = v,
          txn = carriedTxn, schemaDdl = Some(rewriteDf.schema.toDDL), op = "merge")
    }
  }

  /** ATOMIC BACKFILL: replace every row with `c` in [lo, hi] by
    * `replacement` in ONE commit — the reference's monthly
    * delete-then-insert backfill (`database_service.py:415-475` runs
    * DELETE + INSERT in one DB transaction) re-expressed as one
    * snapshot: readers see the old month or the new month, never the
    * deleted-but-not-yet-reloaded window a two-step file backfill
    * exposes. File-level copy-on-write like [[deleteRange]] (only
    * envelope-intersecting files rewrite; the replacement rows ride the
    * same write), NULL-`c` rows in rewritten files survive, and the
    * caller is trusted that `replacement` itself lies in [lo, hi] —
    * rows outside it are still INSERTED (this is replace-range +
    * insert, not a filtered load; validate upstream, as the reference's
    * count-first guard does). */
  def replaceRange(spark: SparkSession, path: String, c: String,
      lo: Long, hi: Long, replacement: DataFrame, files: Int,
      statsCols: Seq[String] = Nil, txn: Option[String] = None): Long = {
    require(lo <= hi, s"replaceRange: lo $lo > hi $hi")
    val (v, lines) = currentLines(spark, path)
    require(v > 0, s"manifest table $path does not exist")
    if (txn.isDefined && lastTxn(spark, path) == txn) return v
    enforceConstraints(spark, path, replacement, "replaceRange")
    val base = new Path(path)
    val (touched, untouched) = lines.partition { l =>
      parseEntry(l).stats.get(c)
        .forall { case (flo, fhi) => fhi >= lo && flo <= hi }
    }
    val survivors =
      if (touched.isEmpty) None
      else Some(spark.read.option("mergeSchema", "true")
        .parquet(touched.map(l =>
          resolveFile(base, parseEntry(l).path).toString): _*)
        .filter(col(c).cast("long").isNull ||
          !col(c).cast("long").between(lo, hi)))
    val rewriteDf = survivors match {
      case Some(s) => s.unionByName(replacement, allowMissingColumns = true)
      case None    => replacement
    }
    val rewritten = writeDataFiles(spark, path, rewriteDf,
      files = math.max(files, touched.size), Nil,
      inheritStats(statsCols, lines))
    commit(spark, path, untouched ++ rewritten, expectedCurrent = v,
      txn = txn.orElse(lastTxn(spark, path)),
      schemaDdl = Some(rewriteDf.schema.toDDL), op = "replace-range")
  }

  /** Incremental scan: the rows ADDED between snapshot `fromVersion`
    * (exclusive) and `toVersion` (inclusive) — the files in `to`'s
    * manifest that `from`'s does not list. This is the incremental-
    * consumer primitive: a downstream job processes only the delta
    * since the snapshot it last saw, never the table (at 100 TB the
    * difference between a nightly re-read and a nightly no-op).
    *
    * Defined for APPEND-ONLY ranges: if any file `from` listed is gone
    * by `to` (a compact/delete/upsert rewrote history in between), the
    * added files double-count rewritten rows — the call fails loudly
    * and the consumer should fall back to a full re-read, the row-level
    * [[diffSnapshots]], or opt into `ignoreRewrites = true` (deliver
    * the added files anyway — rewritten files' SURVIVING rows arrive
    * again, so downstream must tolerate duplicates; the Delta
    * `ignoreChanges` contract). Returns an empty, schema-typed frame
    * when nothing was added. Both versions must still be retained
    * ([[vacuum]]). */
  def readChanges(spark: SparkSession, path: String,
      fromVersion: Long, toVersion: Long,
      ignoreRewrites: Boolean = false): DataFrame = {
    require(fromVersion <= toVersion,
      s"readChanges: from $fromVersion > to $toVersion")
    val from = snapshotAt(spark, path, fromVersion)
    val to = snapshotAt(spark, path, toVersion)
    val fromFiles = from.lines.map(parseEntry(_).path).toSet
    val toFiles = to.lines.map(parseEntry(_).path)
    val removed = fromFiles -- toFiles.toSet
    require(ignoreRewrites || removed.isEmpty,
      s"manifest table $path: v$fromVersion..v$toVersion is not " +
        s"append-only (${removed.size} file(s) rewritten/removed, e.g. " +
        s"${removed.head}) — added files would double-count rewritten " +
        "rows; re-read the snapshot, diffSnapshots, or pass " +
        "ignoreRewrites = true to accept duplicates")
    val added = toFiles.filterNot(fromFiles)
    if (added.isEmpty)
      return read(spark, path, version = Some(toVersion)).limit(0)
    val base = new Path(path)
    spark.read.option("mergeSchema", "true")
      .parquet(added.map(f => resolveFile(base, f).toString): _*)
  }

  /** Incremental-consumer checkpoint: run `process` over the delta
    * since the version recorded in `stateFile`, then record the new
    * version — the consumer half of [[readChanges]] (a nightly
    * downstream job calls this and touches only the day's arrivals).
    * First run (no state) processes the whole table. The state write is
    * staged + one rename, and it happens AFTER `process` returns: a
    * crash mid-process re-delivers the same delta on restart —
    * AT-LEAST-ONCE, so pair it with an idempotent sink (e.g.
    * [[graft.streaming.StreamingEtl.writeBatchUpsert]] keyed on the
    * delta's version tag) for exactly-once end to end. Retention
    * contract: [[vacuum]]'s keepVersions must cover the slowest
    * consumer's lag, or its next readChanges fails loudly (never
    * silently re-reads the world). Returns the version now recorded. */
  def processChanges(spark: SparkSession, path: String,
      stateFile: String)(process: DataFrame => Unit): Long = {
    val (fs, sp) = fsOf(spark, stateFile)
    val from: Long =
      if (!fs.exists(sp)) 0L
      else {
        val in = fs.open(sp)
        val s = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
        s.trim.toLong
      }
    val (cur, _) = currentManifest(spark, path)
    require(cur > 0, s"manifest table $path does not exist")
    if (cur == from) return from // nothing new — no read, no state churn
    val delta =
      if (from == 0L) read(spark, path)
      else readChanges(spark, path, from, cur)
    process(delta)
    val staged = new Path(sp.getParent,
      s".${sp.getName}.staged.${java.util.UUID.randomUUID.toString.take(8)}")
    val out = fs.create(staged, false)
    try out.write(s"$cur\n".getBytes("UTF-8")) finally out.close()
    fs.delete(sp, false) // raw-local rename refuses an existing target
    require(fs.rename(staged, sp),
      s"could not record consumer state at $stateFile")
    cur
  }

  /** Row-level CHANGE FEED between two retained snapshots — the diff
    * [[readChanges]] refuses when maintenance rewrote history. Returns
    * the `to`-snapshot's columns plus `_change` ('insert'/'delete'),
    * with bag semantics: a row updated in place is one delete (old
    * values) + one insert (new values); duplicate rows diff by
    * multiplicity.
    *
    * Scale shape: only the SYMMETRIC DIFFERENCE of the two file lists
    * is ever listed or opened — files both snapshots share cancel
    * driver-side by manifest path, so a copy-on-write delete / upsert /
    * backfill diffs in I/O proportional to the files it touched, not
    * the table ([[deleteRange]]'s envelope pruning bounds that churn to
    * the slice). Surviving rows that a rewrite carried over cancel
    * VALUE-wise in one hash aggregation (insert count minus delete
    * count per distinct row, non-zero survives — one scan of the
    * changed slice, one shuffle; no per-direction `exceptAll` double
    * scan), so a pure [[compact]] or [[rollback]] round-trip diffs to
    * empty. Both versions must still be retained ([[vacuum]]). */
  def diffSnapshots(spark: SparkSession, path: String,
      fromVersion: Long, toVersion: Long): DataFrame = {
    require(fromVersion <= toVersion,
      s"diffSnapshots: from $fromVersion > to $toVersion")
    val from = snapshotAt(spark, path, fromVersion)
    val to = snapshotAt(spark, path, toVersion)
    val fromFiles = from.lines.map(parseEntry(_).path)
    val toFiles = to.lines.map(parseEntry(_).path)
    val removed = fromFiles.filterNot(toFiles.toSet)
    val added = toFiles.filterNot(fromFiles.toSet)
    val base = new Path(path)
    def slice(fs: Seq[String], tag: String): DataFrame =
      spark.read.option("mergeSchema", "true")
        .parquet(fs.map(f => resolveFile(base, f).toString): _*)
        .withColumn("_change", lit(tag))
    val tagged = (removed, added) match {
      case (Nil, Nil) =>
        // identical file lists (e.g. a no-op commit): typed empty feed
        return read(spark, path, version = Some(toVersion)).limit(0)
          .withColumn("_change", lit(""))
      case (Nil, a) => slice(a, "insert")
      case (r, Nil) => slice(r, "delete")
      case (r, a) => slice(a, "insert") // unionByName aligns evolved
        .unionByName(slice(r, "delete"), allowMissingColumns = true)
    }
    val dataCols = tagged.columns.filter(_ != "_change")
    tagged.groupBy(dataCols.map(col): _*)
      .agg((fsum(when(col("_change") === "insert", 1L).otherwise(0L)) -
        fsum(when(col("_change") === "delete", 1L).otherwise(0L))).as("_n"))
      .filter(col("_n") =!= 0L)
      .withColumn("_change",
        when(col("_n") > 0L, "insert").otherwise("delete"))
      .withColumn("_dup", explode(sequence(lit(1L), fabs(col("_n")))))
      .select(dataCols.map(col) :+ col("_change"): _*)
  }

  /** ROLLBACK: republish snapshot `toVersion`'s exact file list (and
    * txn tag — the table state IS that snapshot, so a writer replaying
    * the rolled-back batch must re-append) as the NEXT version. Nothing
    * is deleted or rewritten — a rollback of a rollback works, readers
    * switch with the usual one-rename visibility, and [[vacuum]]'s
    * retention governs how far back is reachable. The undo-a-bad-write
    * op: data files are immutable, so restoring a state is just
    * restoring a file list. */
  def rollback(spark: SparkSession, path: String,
      toVersion: Long): Long = {
    val target = snapshotAt(spark, path, toVersion)
    val (cur, _) = currentLines(spark, path)
    require(toVersion <= cur,
      s"rollback: v$toVersion is ahead of current v$cur")
    commit(spark, path, target.lines, expectedCurrent = cur,
      txn = target.txn, schemaDdl = target.schemaDdl, op = "rollback")
  }

  /** The snapshot's per-file metadata as a DataFrame — the `.files`
    * inspection table every manifest format grows (Iceberg `.files`,
    * Delta `DESCRIBE DETAIL`): one row per (file, stats column) with
    * the recorded row count and (min, max) envelope, a single
    * null-stat row for files that carry none. Driver-side over the one
    * manifest — no file opens, any table size. This is also the
    * AUDIT surface: the p29 gate pins that the recorded metadata is
    * TRUE of the data (Σ n_rows = count(*), min/max envelopes bound
    * the real extremes) — stats a pruning read trusts must never
    * drift from the files they describe. */
  def filesDf(spark: SparkSession, path: String,
      version: Option[Long] = None): DataFrame = {
    val (v, entries) = entriesOf(spark, path, version)
    require(v > 0, s"manifest table $path does not exist")
    val rows = entries.flatMap { e =>
      val nRows: java.lang.Long =
        e.stats.get(RowsStat).map(s => java.lang.Long.valueOf(s._1)).orNull
      val dataStats = e.stats.view.filterKeys(_ != RowsStat).toSeq
      if (dataStats.isEmpty)
        Seq(Row(e.path, nRows, null, null, null))
      else dataStats.map { case (c, (lo, hi)) =>
        Row(e.path, nRows, c, java.lang.Long.valueOf(lo),
          java.lang.Long.valueOf(hi))
      }
    }
    spark.createDataFrame(
      new java.util.ArrayList[Row](rows.asJava),
      StructType.fromDDL(
        "file STRING, n_rows BIGINT, stat_col STRING, " +
          "stat_min BIGINT, stat_max BIGINT"))
  }

  /** Retained commit history as a DataFrame: one row per retained
    * manifest — version, file count, metadata row count (null when any
    * file predates `__rows`), txn tag, and the tag names pinning it.
    * Driver-side (a read per retained manifest, no data I/O). */
  def history(spark: SparkSession, path: String): DataFrame = {
    val (fs, p) = fsOf(spark, path)
    val byVersion = tags(spark, path).toSeq.groupBy(_._2)
    val rows = versions(spark, path).map { v =>
      val snap = readSnapshot(fs, p, v)
      val entries = snap.lines.map(parseEntry)
      val counts = entries.map(_.stats.get(RowsStat).map(_._1))
      val nRows: java.lang.Long =
        if (counts.nonEmpty && counts.forall(_.isDefined))
          java.lang.Long.valueOf(counts.flatten.sum)
        else null
      Row(v, snap.op.orNull, entries.size.toLong, nRows, snap.txn.orNull,
        byVersion.getOrElse(v, Nil).map(_._1).sorted)
    }
    spark.createDataFrame(
      new java.util.ArrayList[Row](rows.asJava),
      StructType.fromDDL(
        "version BIGINT, op STRING, n_files BIGINT, n_rows BIGINT, " +
          "txn STRING, tags ARRAY<STRING>"))
  }

  /** SHALLOW CLONE: a zero-copy writable branch of snapshot `version`
    * (default: current). The clone's first manifest lists the SOURCE's
    * data files by ABSOLUTE path — no bytes move, any table size, one
    * driver-side manifest write — and every subsequent write on the
    * clone lands under the clone's own directory: appends add, CoW
    * deletes/upserts rewrite only what they touch (dropping the
    * absolute refs they rewrite), [[compact]] fully materializes it.
    * The experiment-branch primitive: fork the corpus, filter/augment
    * the fork, train, diff — the source never sees any of it.
    *
    * Durability: the clone is valid while the source snapshot's FILES
    * survive the source's [[vacuum]] — so by default the source
    * version is pinned with a tag (`clone-<dst name>-v<version>`),
    * making the lifetime explicit and releasable ([[dropTag]] when the
    * clone is compacted or dropped). `pinSource = false` skips the pin
    * (caller owns retention — e.g. the source is already tagged).
    * Returns the clone's version (always 1). */
  def shallowClone(spark: SparkSession, src: String, dst: String,
      version: Option[Long] = None, pinSource: Boolean = true): Long = {
    val (sfs, sp) = fsOf(spark, src)
    val snap = version match {
      case Some(ver) => snapshotAt(spark, src, ver)
      case None =>
        val s = currentSnapshot(spark, src)
        require(s.isDefined, s"manifest table $src does not exist")
        s.get
    }
    require(currentLines(spark, dst)._1 == 0L,
      s"shallowClone: $dst is already a manifest table")
    val qualified = sfs.makeQualified(sp)
    val absLines = snap.lines.map { l =>
      val cut = l.indexOf('|')
      val (file, rest) =
        if (cut < 0) (l, "") else (l.substring(0, cut), l.substring(cut))
      resolveFile(qualified, file).toString + rest
    }
    if (pinSource) {
      val dstName = new Path(dst).getName
        .replaceAll("[^A-Za-z0-9._-]", "-")
      tag(spark, src, s"clone-$dstName-v${snap.version}",
        Some(snap.version))
    }
    val (dfs, dp) = fsOf(spark, dst)
    dfs.mkdirs(dp)
    // a clone is a NEW table: no txn carried (its streams/writers are
    // its own), schema carried so an empty clone still types
    commit(spark, dst, absLines, expectedCurrent = 0L, txn = None,
      schemaDdl = snap.schemaDdl, op = "clone")
  }

  /** CHECK constraints: data quality enforced AT THE COMMIT BOUNDARY —
    * a table property (carried in every manifest header) every
    * data-adding write validates its INCOMING rows against, refusing
    * the whole commit on any violation (nothing partial lands; the
    * training-data contract "no empty text ever enters the corpus"
    * becomes unbypassable instead of a convention). SQL semantics:
    * a row violates when the expression is FALSE; NULL passes (add a
    * explicit IS NOT NULL to forbid it). Adding a constraint validates
    * the WHOLE existing table first (one scan, at add time only — so
    * maintenance rewrites of already-validated rows never re-check),
    * then commits a same-files snapshot carrying the new set. Write
    * cost afterwards is one pass over each batch's new rows. */
  def addConstraint(spark: SparkSession, path: String, name: String,
      sqlExpr: String): Long = {
    require(name.matches(TagPattern),
      s"constraint name '$name' must match $TagPattern")
    require(sqlExpr.nonEmpty && !sqlExpr.contains('\n'),
      "constraint expression must be non-empty and single-line")
    val (v, _) = currentLines(spark, path)
    require(v > 0, s"manifest table $path does not exist")
    val snap = snapshotAt(spark, path, v)
    require(!snap.constraints.exists(_._1 == name),
      s"constraint '$name' already exists on $path")
    val bad = read(spark, path, mergeSchema = true)
      .filter(!org.apache.spark.sql.functions.coalesce(
        org.apache.spark.sql.functions.expr(sqlExpr).cast("boolean"),
        lit(true))).count()
    require(bad == 0L,
      s"cannot add constraint '$name' ($sqlExpr): $bad existing row(s) " +
        "violate it — clean the table first")
    commit(spark, path, snap.lines, expectedCurrent = v, txn = snap.txn,
      schemaDdl = snap.schemaDdl, op = "add-constraint",
      constraintsOverride = Some(snap.constraints :+ (name -> sqlExpr)))
  }

  /** Drop a CHECK constraint; later writes stop validating it. */
  def dropConstraint(spark: SparkSession, path: String,
      name: String): Long = {
    val (v, _) = currentLines(spark, path)
    require(v > 0, s"manifest table $path does not exist")
    val snap = snapshotAt(spark, path, v)
    require(snap.constraints.exists(_._1 == name),
      s"manifest table $path has no constraint '$name'")
    commit(spark, path, snap.lines, expectedCurrent = v, txn = snap.txn,
      schemaDdl = snap.schemaDdl, op = "drop-constraint",
      constraintsOverride = Some(snap.constraints.filterNot(_._1 == name)))
  }

  /** The table's CHECK constraints, name -> SQL expression. */
  def constraints(spark: SparkSession, path: String): Map[String, String] =
    currentSnapshot(spark, path).map(_.constraints.toMap)
      .getOrElse(Map.empty)

  /** Refuse the write when any incoming row violates a table
    * constraint — called by every data-adding write on its NEW rows
    * only ([[addConstraint]] validated everything older). */
  private def enforceConstraints(spark: SparkSession, path: String,
      df: => DataFrame, op: String): Unit = {
    // by-name `df`: constraint-free tables (the common case) never pay
    // for constructing the frame — merge(keep)'s check reads back the
    // just-written slice, whose plain construction costs footer-based
    // schema inference even when there is nothing to enforce
    val cs = currentSnapshot(spark, path).map(_.constraints)
      .getOrElse(Nil)
    if (cs.isEmpty) return
    // ALL constraints validate in ONE aggregate pass over the incoming
    // rows (the pre-r15 shape ran one count() job per constraint — k
    // constraints cost k scans of every data-adding write's input)
    import org.apache.spark.sql.functions.{coalesce, expr}
    val aggs = cs.zipWithIndex.map { case ((_, e), i) =>
      fsum(when(!coalesce(expr(e).cast("boolean"), lit(true)), 1L)
        .otherwise(0L)).as(s"__c$i")
    }
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    cs.zipWithIndex.foreach { case ((n, e), i) =>
      val bad = if (row.isNullAt(i)) 0L else row.getLong(i)
      require(bad == 0L,
        s"$op refused on $path: CHECK constraint '$n' ($e) violated " +
          s"by $bad incoming row(s) — nothing committed")
    }
  }

  /** Valid tag names; the pattern excludes '.'-led and 'staged'-like
    * collisions with internal names by requiring an alphanumeric head. */
  private val TagName = """_tag\.([A-Za-z0-9][A-Za-z0-9._-]*)""".r
  private val TagPattern = "[A-Za-z0-9][A-Za-z0-9._-]*"

  /** TAG: a named, durable ref to a snapshot — "model-x-train-set"
    * instead of "version 17". Tags PIN their version against [[vacuum]]
    * (retention keeps every tagged manifest and its data files until
    * [[dropTag]]), so "read the exact corpus model X trained on" stays
    * answerable past keepVersions — the reproducibility contract with a
    * name on it. A tag is a `_tag.<name>` file holding the version,
    * published staged + one rename like a manifest; it never moves
    * (refuses an existing name — drop first, explicitly). Defaults to
    * the current version. Tagging a vacuumed/uncommitted version is
    * refused (never mint a dangling ref). Returns the pinned version. */
  def tag(spark: SparkSession, path: String, name: String,
      version: Option[Long] = None): Long = {
    require(name.matches(TagPattern),
      s"tag name '$name' must match $TagPattern")
    val (fs, p) = fsOf(spark, path)
    val v = version.getOrElse {
      val (cur, _) = currentManifest(spark, path)
      require(cur > 0, s"manifest table $path does not exist")
      cur
    }
    require(fs.exists(new Path(p, s"_manifest.$v")),
      s"manifest table $path: cannot tag version $v — not retained " +
        s"(vacuumed or never committed); retained: " +
        s"${versions(spark, path).mkString(", ")}")
    val t = new Path(p, s"_tag.$name")
    require(!fs.exists(t),
      s"tag '$name' already exists on $path — dropTag it first " +
        "(tags never silently move)")
    val staged = new Path(p,
      s".tag.staged.${java.util.UUID.randomUUID.toString.take(12)}")
    val out = fs.create(staged, false)
    try out.write(s"$v\n".getBytes("UTF-8")) finally out.close()
    require(fs.rename(staged, t), s"could not publish tag $t")
    v
  }

  /** All tags on the table, name -> pinned version. */
  def tags(spark: SparkSession, path: String): Map[String, Long] = {
    val (fs, p) = fsOf(spark, path)
    if (!fs.exists(p)) return Map.empty
    fs.listStatus(p).iterator.flatMap { st =>
      st.getPath.getName match {
        case TagName(n) =>
          val in = fs.open(st.getPath)
          val s = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
          finally in.close()
          Some(n -> s.trim.toLong)
        case _ => None
      }
    }.toMap
  }

  /** Read the snapshot a tag pins — [[read]] at the tag's version. */
  def readTag(spark: SparkSession, path: String, name: String,
      mergeSchema: Boolean = false): DataFrame = {
    val vs = tags(spark, path)
    require(vs.contains(name),
      s"manifest table $path has no tag '$name'; tags: " +
        s"${vs.keys.toSeq.sorted.mkString(", ")}")
    read(spark, path, mergeSchema = mergeSchema, version = Some(vs(name)))
  }

  /** Drop a tag: the version loses its pin and the next [[vacuum]] may
    * reclaim it (if outside keepVersions) — deletion stays a vacuum
    * decision, never a dropTag side effect. */
  def dropTag(spark: SparkSession, path: String, name: String): Unit = {
    val (fs, p) = fsOf(spark, path)
    val t = new Path(p, s"_tag.$name")
    require(fs.exists(t), s"manifest table $path has no tag '$name'")
    require(fs.delete(t, false), s"could not delete tag $t")
  }

  /** `col BETWEEN lo AND hi` through MANIFEST-SIDE file pruning: keep
    * only the files whose recorded [min, max] envelope intersects the
    * range (files without stats for `c` are always kept — conservative)
    * and apply the exact predicate to just those. At 100 TB the win is
    * not row-group skipping — parquet already does that — it is never
    * LISTING or opening the excluded files: for a selective range over
    * a [[create]]d/[[compact]]ed clustered table, I/O is proportional
    * to the slice, and the decision runs driver-side over the one
    * manifest (a line per file), no footer reads at all. The same
    * stats-in-manifest idea as Iceberg/Delta file skipping. */
  def readRange(spark: SparkSession, path: String, c: String,
      lo: Long, hi: Long, version: Option[Long] = None): DataFrame = {
    require(lo <= hi, s"readRange: lo $lo > hi $hi")
    val (v, entries) = entriesOf(spark, path, version)
    require(v > 0, s"manifest table $path does not exist")
    val base = new Path(path)
    val keep = entries.filter(e =>
      e.stats.get(c).forall { case (flo, fhi) => fhi >= lo && flo <= hi })
    if (keep.isEmpty) {
      // empty by stats: derive the (empty) frame with the same schema
      // from one file rather than inventing a schema
      return read(spark, path, version = version).filter(lit(false))
    }
    spark.read.parquet(keep.map(e => resolveFile(base, e.path).toString): _*)
      .filter(col(c).cast("long").between(lo, hi))
  }

  /** Delete data files referenced by NONE of the newest `keepVersions`
    * manifests, staged manifest leftovers, and the superseded manifests
    * themselves. keepVersions >= 2 keeps the previous snapshot readable
    * for in-flight readers (grace); run vacuum only when anything that
    * resolved an older manifest has drained. A vacuum racing an
    * in-flight writer can delete the writer's staged manifest or
    * not-yet-committed files — the writer then FAILS LOUDLY at publish
    * (nothing committed corrupts), but schedule vacuum in the same
    * single-writer window as compaction. Returns deleted paths. */
  def vacuum(spark: SparkSession, path: String,
      keepVersions: Int = 2): Seq[String] = {
    require(keepVersions >= 1, "keepVersions must be >= 1")
    val (fs, p) = fsOf(spark, path)
    val (v, _) = currentManifest(spark, path)
    require(v > 0, s"manifest table $path does not exist")
    // keep only versions that still EXIST: an earlier vacuum with a
    // smaller keepVersions may already have reclaimed _manifest.(v-1) —
    // keep-what-exists, never throw on the gap. TAGGED versions are
    // pinned regardless of age ([[tag]]'s retention contract).
    val keepManifests =
      ((0 until keepVersions).map(v - _) ++ tags(spark, path).values)
        .distinct
        .filter(kv => kv > 0 && fs.exists(new Path(p, s"_manifest.$kv")))
    val live: Set[String] = keepManifests.flatMap { kv =>
      readSnapshot(fs, p, kv).lines.map(parseEntry(_).path)
    }.toSet
    val deleted = scala.collection.mutable.ArrayBuffer.empty[String]
    fs.listStatus(p).foreach { st =>
      val name = st.getPath.getName
      name match {
        case ManifestName(mv) =>
          if (!keepManifests.contains(mv.toLong)) {
            fs.delete(st.getPath, false); deleted += name
          }
        case _ if name.startsWith("_manifest.") => // staged leftover
          fs.delete(st.getPath, false); deleted += name
        case _ if name.startsWith(".tag.staged.") => // crashed tag write
          fs.delete(st.getPath, false); deleted += name
        case _ if st.isDirectory && name.startsWith("c") =>
          fs.listStatus(st.getPath).foreach { f =>
            val rel = s"$name/${f.getPath.getName}"
            if (!live.contains(rel) && !f.getPath.getName.startsWith("_")) {
              fs.delete(f.getPath, false); deleted += rel
            }
          }
          if (fs.listStatus(st.getPath)
              .forall(_.getPath.getName.startsWith("_"))) {
            fs.delete(st.getPath, true)
          }
        case _ => // not ours (a reader's scratch, _SUCCESS at root, ...)
      }
    }
    deleted.toSeq
  }

  /** Write `df` into a fresh `c<uuid>/` subdir (range-clustered when
    * `sortCols` given, the [[Layout.writeRangeClustered]] recipe) and
    * return the serialized manifest lines of the parquet files written.
    * The files are INVISIBLE until a manifest referencing them is
    * committed. With `statsCols`, one extra scan of the JUST-WRITTEN
    * files records per-file (min, max) longs in the lines — the
    * write-time cost every stats-carrying table format pays, over new
    * data only, never the table. */
  private def writeDataFiles(spark: SparkSession, path: String,
      df: DataFrame, files: Int, sortCols: Seq[String],
      statsCols: Seq[String], zOrder: Boolean = false): Seq[String] = {
    require(files >= 1, "files must be >= 1")
    require(statsCols.forall(c => !c.exists("|:#".contains(_))),
      "stats column names must not contain '|', ':' or '#'")
    require(!statsCols.contains(RowsStat),
      s"'$RowsStat' is a reserved stat key (per-file row counts)")
    require(!zOrder || sortCols.size == 2,
      "zOrder layout takes exactly two sortCols")
    val sub = "c" + java.util.UUID.randomUUID.toString.take(12)
    val dir = new Path(path, sub)
    if (zOrder)
      // Morton-curve layout: every file narrow in BOTH sortCols, so
      // stats recorded on both let readBox prune on either/both axes
      ZOrder.writeZOrdered(df, sortCols.head, sortCols(1), dir.toString,
        files)
    else if (sortCols.nonEmpty)
      Layout.writeRangeClustered(df, sortCols, dir.toString, files)
    else
      df.repartition(files).write.mode("overwrite").parquet(dir.toString)
    val (fs, _) = fsOf(spark, path)
    val names = fs.listStatus(dir).map(_.getPath.getName)
      .filter(_.endsWith(".parquet")).sorted.toSeq
    val statsByFile: Map[String, String] =
      if (statsCols.isEmpty) Map.empty
      else footerStats(spark, dir, names, df.schema, statsCols).getOrElse {
        // Fallback — ONE scan of the just-written files (the pre-r15
        // stats pass): taken only when a stats column is not integral
        // in the written schema (the footer min/max of e.g. a numeric
        // STRING is lexicographic, not the cast-to-long envelope the
        // manifest records) or a footer lacks trustworthy statistics.
        val aggs = statsCols.flatMap(c => Seq(
          min(col(c).cast("long")).as(s"__lo_$c"),
          max(col(c).cast("long")).as(s"__hi_$c"))) :+
          // row count rides the same scan for free — the metadata-only
          // countRows() source
          org.apache.spark.sql.functions.count(lit(1)).as("__n")
        spark.read.parquet(dir.toString)
          .groupBy(input_file_name().as("__f"))
          .agg(aggs.head, aggs.tail: _*)
          .collect()
          .map { r =>
            val fname = r.getString(0).split('/').last
            val parts = statsCols.flatMap { c =>
              val lo = r.getAs[Any](s"__lo_$c")
              val hi = r.getAs[Any](s"__hi_$c")
              // an all-NULL column in a file has no envelope — omit the
              // stat, the reader keeps the file (conservative)
              if (lo == null || hi == null) None
              else Some(s"$c:$lo:$hi")
            } :+ {
              val n = r.getAs[Long]("__n")
              s"$RowsStat:$n:$n"
            }
            fname -> (if (parts.isEmpty) "" else parts.mkString("|", "|", ""))
          }.toMap
      }
    names.map(n => s"$sub/$n" + statsByFile.getOrElse(n, ""))
  }

  /** ONE-pass key profile of an upsert/merge source: (kLo, kHi,
    * exact distinct keys when they fit `maxCollectedKeys` — sorted, for
    * exact per-file envelope pruning; None past the cap). The pre-r15
    * shape paid TWO full passes over the source — a min/max/
    * count_distinct aggregate, then the distinct-keys collect — for the
    * same information; here the bounds fall out of the collected key
    * set, and only the rare past-the-cap path pays a second (bounds
    * only) pass. `emptyMsg` preserves each caller's refusal message. */
  private def keyProfile(df: DataFrame,
      keyCol: org.apache.spark.sql.Column, maxCollectedKeys: Long,
      emptyMsg: String): (Long, Long, Option[Array[Long]]) = {
    val cap = math.min(maxCollectedKeys, (Int.MaxValue - 2).toLong).toInt
    val collected = df.select(keyCol.as("__k"))
      .where(col("__k").isNotNull)
      .distinct().limit(cap + 1).collect().map(_.getLong(0))
    require(collected.nonEmpty, emptyMsg)
    if (collected.length <= cap) {
      val ks = collected.sorted
      (ks.head, ks.last, Some(ks))
    } else {
      val b = df.agg(min(keyCol), max(keyCol)).head()
      (b.getLong(0), b.getLong(1), None)
    }
  }

  /** Total rows behind freshly-written manifest lines: the `__rows`
    * stat when the write recorded stats, else a driver-side footer read
    * per file — never a data scan. */
  private def writtenRows(spark: SparkSession, path: String,
      lines: Seq[String]): Long = {
    val conf = spark.sparkContext.hadoopConfiguration
    val base = new Path(path)
    lines.map { l =>
      val e = parseEntry(l)
      e.stats.get(RowsStat).map(_._1).getOrElse {
        val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
          org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
            resolveFile(base, e.path), conf))
        try reader.getFooter.getBlocks.asScala.map(_.getRowCount).sum
        finally reader.close()
      }
    }.sum
  }

  /** Signals [[footerStats]] to fall back to the scan-based stats pass. */
  private object FooterBail
    extends scala.util.control.ControlThrowable("footer stats unavailable")

  /** Per-file (min, max) envelopes and row counts from the PARQUET
    * FOOTERS of the just-written files — the write-side stats pass
    * without re-reading a single data page. The pre-r15 shape re-scanned
    * everything it had just written (`read.parquet(...).groupBy(
    * input_file_name())`), one full extra pass per create / append /
    * compact / CoW rewrite; parquet already recorded exact per-row-group
    * min/max/null-count for every column at write, so for INTEGRAL stats
    * columns (the manifest's stat values are longs by contract) the
    * envelope is a driver-side footer read per file — O(files) metadata
    * I/O instead of O(rows) data I/O, which is also the only shape that
    * stays cheap at 100 TB (a compaction's stats pass must not re-read
    * the terabytes it just wrote).
    *
    * Exactness contract (why this can replace the scan bit-for-bit):
    * parquet int32/int64 statistics are exact values, never truncated
    * (truncation applies to binary/string stats only), min/max ignore
    * NULLs exactly like Spark's `min`/`max`, and for integral Spark
    * types `cast("long")` is value-preserving — so footer-derived
    * envelopes equal the scan-derived ones on every input
    * (ManifestTableSpec pins this equality, NULLs and all-NULL files
    * included). Returns None — scan fallback — when any stats column is
    * non-integral in the written schema (string/decimal/date casts
    * don't match footer ordering), a column chunk is missing, or a
    * footer carries no trustworthy statistics (all-NULL is fine and
    * omits the envelope, conservative like the scan path; absent stats
    * with non-null values bails). */
  private def footerStats(spark: SparkSession, dir: Path,
      names: Seq[String], schema: StructType,
      statsCols: Seq[String]): Option[Map[String, String]] = {
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    val integral = schema.fields.collect {
      case f if f.dataType == ByteType || f.dataType == ShortType ||
        f.dataType == IntegerType || f.dataType == LongType => f.name
    }.toSet
    if (!statsCols.forall(integral)) return None
    val conf = spark.sparkContext.hadoopConfiguration
    // footer opens are independent per file and I/O-bound — read them
    // in parallel on the driver (a 16-file write pays one footer
    // latency, not sixteen in sequence; ~35 stats-carrying writes per
    // sweep make this a per-gate constant). Any per-file failure —
    // FooterBail or a transient FS error — falls back to the scan pass
    // for the WHOLE write, exactly like the sequential shape did.
    import scala.collection.parallel.CollectionConverters._
    val perFile: Seq[Option[(String, String)]] = names.par.map { n =>
      try Some(footerStatsOfFile(dir, n, conf, statsCols))
      catch {
        case FooterBail => None
        case scala.util.control.NonFatal(_) => None
      }
    }.seq
    if (perFile.exists(_.isEmpty)) None
    else Some(perFile.flatten.toMap)
  }

  /** One file's manifest-stat string from its parquet footer — throws
    * [[FooterBail]] when the footer's statistics are untrustworthy. */
  private def footerStatsOfFile(dir: Path, n: String,
      conf: org.apache.hadoop.conf.Configuration,
      statsCols: Seq[String]): (String, String) = {
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new Path(dir, n), conf))
    val (rows, ranges) = try {
      val blocks = reader.getFooter.getBlocks.asScala.toSeq
      val nRows = blocks.map(_.getRowCount).sum
      val envelopes = statsCols.map { c =>
        var lo = Long.MaxValue
        var hi = Long.MinValue
        var seen = false
        blocks.foreach { b =>
          val chunk = b.getColumns.asScala
            .find(_.getPath.toDotString == c)
            .getOrElse(throw FooterBail)
          val st = chunk.getStatistics
          if (st == null) throw FooterBail
          if (st.hasNonNullValue) (st.genericGetMin, st.genericGetMax) match {
            case (mn: java.lang.Number, mx: java.lang.Number) =>
              lo = math.min(lo, mn.longValue)
              hi = math.max(hi, mx.longValue)
              seen = true
            case _ => throw FooterBail
          } else if (!st.isNumNullsSet ||
            st.getNumNulls != chunk.getValueCount)
            throw FooterBail // stats absent, not all-NULL: untrustworthy
        }
        // all-NULL column in this file: no envelope — omit the stat,
        // the reader keeps the file (conservative, as the scan path)
        if (seen) Some(s"$c:$lo:$hi") else None
      }
      (nRows, envelopes)
    } finally reader.close()
    val parts = ranges.flatten :+ s"$RowsStat:$rows:$rows"
    n -> parts.mkString("|", "|", "")
  }

  /** Per-table commit mutex (qualified path -> lock). The OCC
    * check-then-rename in [[commit]] is safe cross-process on HDFS
    * (rename refuses an existing target) but raw-local rename(2)
    * REPLACES the target — two same-version committers in one process
    * could silently lose an update. Serializing the critical section
    * per table CLOSES that race for every writer in this JVM — which
    * on `local[*]` (and any single-driver deployment, the normal
    * manifest-writer topology) is every writer, period; losers surface
    * as [[ConcurrentCommitException]] for [[retryOnConflict]]. Only
    * separate PROCESSES on a raw local FS remain narrowed-not-closed
    * (the documented corner; HDFS is exact there). */
  private val commitLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  /** Publish `files` as the next snapshot: write the full manifest to a
    * staged name, then ONE rename to `_manifest.<next>`. Refuses when
    * the table moved past `expectedCurrent` (a concurrent commit) —
    * appends could rebase, but silent rebase under a compact would
    * resurrect compacted files, so both refuse loudly instead. */
  private def commit(spark: SparkSession, path: String,
      files: Seq[String], expectedCurrent: Long,
      txn: Option[String] = None,
      schemaDdl: Option[String] = None,
      op: String = "write",
      constraintsOverride: Option[Seq[(String, String)]] = None): Long = {
    require(txn.forall(t => t.nonEmpty && !t.contains('\n')),
      "txn tag must be non-empty and single-line")
    require(schemaDdl.forall(!_.contains('\n')),
      "schema DDL must be single-line")
    require(op.nonEmpty && !op.contains('\n'),
      "op name must be non-empty and single-line")
    val (fs, p) = fsOf(spark, path)
    fs.mkdirs(p)
    val lock = commitLocks.computeIfAbsent(
      fs.makeQualified(p).toString, _ => new Object)
    lock.synchronized {
      commitLocked(spark, path, fs, p, files, expectedCurrent, txn,
        schemaDdl, op, constraintsOverride)
    }
  }

  private def commitLocked(spark: SparkSession, path: String,
      fs: FileSystem, p: Path, files: Seq[String], expectedCurrent: Long,
      txn: Option[String], schemaDdl: Option[String], op: String,
      constraintsOverride: Option[Seq[(String, String)]]): Long = {
    val snap = currentSnapshot(spark, path)
    val cur = snap.map(_.version).getOrElse(0L)
    if (cur != expectedCurrent) throw new ConcurrentCommitException(
      s"manifest table $path moved (v$cur, expected v$expectedCurrent) — " +
        "concurrent writer; re-run against the new snapshot")
    // constraints are a TABLE property: every commit carries the current
    // set forward verbatim unless add/dropConstraint overrides it
    val constraints = constraintsOverride
      .getOrElse(snap.map(_.constraints).getOrElse(Nil))
    val next = cur + 1
    val target = new Path(p, s"_manifest.$next")
    if (fs.exists(target)) throw new ConcurrentCommitException(
      s"manifest table $path: $target already exists — concurrent writer")
    val staged = new Path(p,
      s"_manifest.staged.${java.util.UUID.randomUUID.toString.take(12)}")
    val out = fs.create(staged, false)
    try {
      val header = s"# graft manifest v$next, ${files.size} files\n" +
        s"# op $op\n" +
        txn.map(t => s"# txn $t\n").getOrElse("") +
        schemaDdl.map(s => s"# schema $s\n").getOrElse("") +
        constraints.sortBy(_._1)
          .map { case (n, e) => s"# constraint $n $e\n" }.mkString
      val body = (header +
        files.sorted.mkString("\n") + "\n").getBytes("UTF-8")
      out.write(body)
    } finally out.close()
    require(fs.rename(staged, target),
      s"manifest table $path: could not publish $target")
    next
  }
}
