package graft.sources.v2

import java.util

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.json.{CreateJacksonParser, JacksonParser, JSONOptions}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Kafka-SHAPED streaming source over a partitioned log directory —
  * the "where does my topic plug in" connector, with the external
  * broker modeled by the filesystem (no Kafka jars in this
  * environment; swapping the segment-file read loop for a consumer
  * fetch changes nothing structurally, exactly like the Square
  * source's HTTPS loop).
  *
  * Layout (a log, not a dump):
  * {{{
  *   logdir/p0/00000000000000000000.jsonl   // segment, name = base offset
  *   logdir/p0/00000000000000000042.jsonl   // next segment: base 42
  *   logdir/p1/...
  * }}}
  * One JSON record per line; a record's offset is segment base + line
  * index, so offsets are dense, stable, and independent of parse
  * success (a malformed line still occupies its offset and surfaces
  * with NULL key/value — skipping would silently shift every later
  * offset and break exactly-once replay).
  *
  * Streaming contract (the part Kafka users actually rely on):
  *  - per-partition offsets, JSON-serialized into Spark's offset log;
  *  - `latestOffset` touches only each partition's LAST segment (the
  *    active one) — earlier segment extents come from the NEXT
  *    segment's base-offset name, so end-offset discovery is O(active
  *    segment), not O(log);
  *  - `planInputPartitions(start, end)` is a pure function of the
  *    offset range — same range, same rows, which is what makes
  *    checkpoint recovery exactly-once;
  *  - `commit` is a no-op: like a broker, the log retains data
  *    regardless of consumer progress.
  *
  * Batch reads (`spark.read.format("graft-log")`) scan the full log —
  * used by the e10 gate, whose DuckDB oracle recomputes offsets from
  * record-embedded sequence numbers.
  */
object GraftLog {

  /** Kafka-shaped output: where the record sits + what it carries. */
  val schema: StructType = StructType(Seq(
    StructField("partition", IntegerType, nullable = false),
    StructField("offset", LongType, nullable = false),
    StructField("timestamp", LongType, nullable = true),
    StructField("key", StringType, nullable = true),
    StructField("value", StringType, nullable = true)))

  /** The on-disk record payload (offset/partition are positional). */
  val recordSchema: StructType = StructType(Seq(
    StructField("timestamp", LongType, nullable = true),
    StructField("key", StringType, nullable = true),
    StructField("value", StringType, nullable = true)))

  private[v2] def segName(base: Long): String = f"$base%020d.jsonl"

  /** Sink-committed segment name: base offset + the epoch that wrote
    * it. The epoch tag is what makes the sink's commit IDEMPOTENT — a
    * retry of a crashed epoch first deletes every segment tagged with
    * its own epoch (partial leftovers of the dead attempt), so the
    * re-renames can never duplicate records (see
    * [[GraftLogStreamingWrite.commit]]). */
  private[v2] def epochSegName(base: Long, epoch: Long): String =
    f"$base%020d.e$epoch%d.jsonl"

  private val segRe = """(\d{20})(\.e(\d+))?\.jsonl""".r

  /** Epoch tag of a segment file name (None for producer segments). */
  private[v2] def segEpoch(name: String): Option[Long] = name match {
    case segRe(_, _, e) if e != null => Some(e.toLong)
    case _ => None
  }

  private[v2] def partitionDirs(dir: String,
      conf: SerializableHadoopConf): Seq[(Int, Path)] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(conf.value)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.matches("p\\d+"))
      .map(s => s.getPath.getName.drop(1).toInt -> s.getPath)
      .sortBy(_._1)
  }

  /** Segments of one partition dir, sorted by base offset. */
  private[v2] def segments(partDir: Path,
      conf: SerializableHadoopConf): Seq[(Long, FileStatus)] = {
    val fs = partDir.getFileSystem(conf.value)
    fs.listStatus(partDir).toSeq
      .flatMap { s =>
        s.getPath.getName match {
          case segRe(base, _, _) => Some(base.toLong -> s)
          case _ => None
        }
      }
      .sortBy(_._1)
  }

  private[v2] def countLines(path: Path,
      conf: SerializableHadoopConf): Long = {
    val in = path.getFileSystem(conf.value).open(path)
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines().size.toLong
    finally in.close()
  }

  /** End offset (exclusive) of one partition: last segment's base +
    * its line count. Only the active segment is read. */
  private[v2] def endOffset(partDir: Path,
      conf: SerializableHadoopConf): Long =
    segments(partDir, conf).lastOption
      .map { case (base, s) => base + countLines(s.getPath, conf) }
      .getOrElse(0L)

  /** Producer/ingest helper: append records to a partition as ONE new
    * segment based at the current end offset. Returns the new end.
    * (The writer a real pipeline would run; specs and fixtures use it
    * so the layout contract lives in one place.)
    *
    * SINGLE-WRITER CONTRACT: a log that a streaming sink commits into
    * must not receive concurrent external append()s. The sink's
    * crash-retry wipes the dead attempt's epoch-tagged segments and
    * re-renames from the then-current end offset; a producer segment
    * that landed BETWEEN the crash and the retry would be based past
    * the wiped range, leaving a permanent offset hole readers cannot
    * resolve. One writer per log (the Kafka-partition ownership model);
    * interleave producers and sinks only across different logs. */
  def append(dir: String, partition: Int,
      records: Seq[(Long, String, String)]): Long = {
    // session Hadoop conf when one exists (FS credentials), else plain
    val conf = new SerializableHadoopConf(
      org.apache.spark.sql.SparkSession.getActiveSession
        .orElse(org.apache.spark.sql.SparkSession.getDefaultSession)
        .map(_.sessionState.newHadoopConf())
        .getOrElse(new org.apache.hadoop.conf.Configuration()))
    val partDir = new Path(dir, s"p$partition")
    val fs = partDir.getFileSystem(conf.value)
    fs.mkdirs(partDir)
    val base = endOffset(partDir, conf)
    // an empty segment would collide with the next append's base name
    if (records.isEmpty) return base
    val out = fs.create(new Path(partDir, segName(base)), false)
    try records.foreach { case (ts, k, v) =>
      def js(s: String) =
        if (s == null) "null"
        else "\"" + s.flatMap {
          case '"' => "\\\""
          case '\\' => "\\\\"
          case c if c < ' ' => f"\\u${c.toInt}%04x"
          case c => c.toString
        } + "\""
      out.write(
        s"""{"timestamp":$ts,"key":${js(k)},"value":${js(v)}}\n"""
          .getBytes("UTF-8"))
    } finally out.close()
    base + records.size
  }

  /** Retention: delete whole segments that end at or before `offset`
    * (a segment's extent ends at the NEXT segment's base, so no data
    * reads — and the active segment always survives, like a broker's
    * log cleaner that never splits a segment). Offsets of retained
    * records are untouched; a reader asked for an offset below the
    * retained head resumes at the head (Kafka's "earliest available").
    * Returns the new earliest offset. */
  def truncateBefore(dir: String, partition: Int, offset: Long): Long = {
    val conf = new SerializableHadoopConf(
      org.apache.spark.sql.SparkSession.getActiveSession
        .orElse(org.apache.spark.sql.SparkSession.getDefaultSession)
        .map(_.sessionState.newHadoopConf())
        .getOrElse(new org.apache.hadoop.conf.Configuration()))
    val partDir = new Path(dir, s"p$partition")
    val fs = partDir.getFileSystem(conf.value)
    val segs = segments(partDir, conf)
    segs.zip(segs.drop(1)).foreach { case ((_, st), (nextBase, _)) =>
      if (nextBase <= offset) fs.delete(st.getPath, false)
    }
    segments(partDir, conf).headOption.map(_._1)
      .getOrElse(endOffset(partDir, conf))
  }
}

class GraftLogSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-log"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GraftLog.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new GraftLogTable(properties.get("path"))
}

class GraftLogTable(path: String) extends Table
  with SupportsRead with org.apache.spark.sql.connector.catalog.SupportsWrite {
  override def name(): String = s"graft_log($path)"
  override def schema(): StructType = GraftLog.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ,
      TableCapability.STREAMING_WRITE)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new GraftLogScan(path,
        new SerializableHadoopConf(org.apache.spark.sql.SparkSession
          .active.sessionState.newHadoopConf()))
    }

  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder =
    new org.apache.spark.sql.connector.write.WriteBuilder {
      override def build(): org.apache.spark.sql.connector.write.Write =
        new GraftLogWrite(path, info.schema(),
          Option(info.options.get("partitions")).map(_.toInt).getOrElse(1),
          new SerializableHadoopConf(org.apache.spark.sql.SparkSession
            .active.sessionState.newHadoopConf()))
    }
}

/** Per-partition offset map, JSON-serialized into Spark's offset log
  * (the WAL that makes recovery resume at the committed range). */
case class GraftLogOffset(parts: Map[Int, Long]) extends Offset {
  override def json(): String =
    parts.toSeq.sortBy(_._1)
      .map { case (p, o) => s""""$p":$o""" }
      .mkString("{", ",", "}")
}

object GraftLogOffset {
  private val entry = """"(\d+)"\s*:\s*(\d+)""".r
  def fromJson(s: String): GraftLogOffset =
    GraftLogOffset(entry.findAllMatchIn(s)
      .map(m => m.group(1).toInt -> m.group(2).toLong).toMap)
}

class GraftLogScan(path: String, conf: SerializableHadoopConf)
  extends Scan {

  override def readSchema(): StructType = GraftLog.schema

  override def description(): String = s"GraftLogScan path=$path"

  /** Batch: the full log, one InputPartition per log partition. */
  override def toBatch: Batch = new Batch {
    override def planInputPartitions(): Array[InputPartition] =
      GraftLog.partitionDirs(path, conf).map { case (pid, dir) =>
        GraftLogRange(pid, dir.toString, 0L,
          GraftLog.endOffset(dir, conf)): InputPartition
      }.toArray
    override def createReaderFactory(): PartitionReaderFactory =
      new GraftLogReaderFactory(conf)
  }

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new GraftLogMicroBatchStream(path, conf)
}

class GraftLogMicroBatchStream(path: String, conf: SerializableHadoopConf)
  extends MicroBatchStream {

  override def initialOffset(): Offset =
    GraftLogOffset(GraftLog.partitionDirs(path, conf)
      .map { case (pid, _) => pid -> 0L }.toMap)

  override def latestOffset(): Offset =
    GraftLogOffset(GraftLog.partitionDirs(path, conf)
      .map { case (pid, dir) => pid -> GraftLog.endOffset(dir, conf) }
      .toMap)

  override def deserializeOffset(json: String): Offset =
    GraftLogOffset.fromJson(json)

  /** Pure function of the offset range: same (start, end], same rows —
    * the exactly-once replay contract. Partitions first seen mid-run
    * (absent from `start`) begin at 0. */
  override def planInputPartitions(start: Offset,
      end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[GraftLogOffset].parts
    val e = end.asInstanceOf[GraftLogOffset].parts
    GraftLog.partitionDirs(path, conf)
      .flatMap { case (pid, dir) =>
        val from = s.getOrElse(pid, 0L)
        val to = e.getOrElse(pid, 0L)
        if (to > from) Some(GraftLogRange(pid, dir.toString, from, to)
          : InputPartition)
        else None
      }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftLogReaderFactory(conf)

  /** Broker semantics: data is retained regardless of progress. */
  override def commit(end: Offset): Unit = ()

  override def stop(): Unit = ()
}

case class GraftLogRange(partitionId: Int, partDir: String,
    startOffset: Long, endOffset: Long) extends InputPartition

// ===== write path (streaming sink) =====

/** One staged file an executor wrote: destination log partition, the
  * hidden temp path inside that partition dir, and its record count
  * (rides the commit message so the driver never reads data). */
case class GraftLogStagedFile(partition: Int, tmpPath: String, lines: Long)
  extends org.apache.spark.sql.connector.write.WriterCommitMessage

/** Exactly-once log sink. Tasks write records as HIDDEN temp files
  * (`.tmp-...`, invisible to the segment regex) inside their target
  * partition dirs; the driver's `commit(epochId, _)` renames them into
  * offset-named segments in deterministic (partition, taskId) order —
  * a metadata-only commit, no data moves through the driver — and
  * drops an `_epochs/<id>` marker first checked on entry, so a
  * replayed epoch after failure commits nothing twice. Input rows
  * route by their `partition` column when present and non-null,
  * else hash(key) % partitions (option `partitions`, default 1) —
  * the Kafka producer contract. */
class GraftLogWrite(path: String, inputSchema: StructType, partitions: Int,
    conf: SerializableHadoopConf)
  extends org.apache.spark.sql.connector.write.Write {

  override def toStreaming
      : org.apache.spark.sql.connector.write.streaming.StreamingWrite =
    new GraftLogStreamingWrite(path, inputSchema, partitions, conf)
}

class GraftLogStreamingWrite(path: String, inputSchema: StructType,
    partitions: Int, conf: SerializableHadoopConf)
  extends org.apache.spark.sql.connector.write.streaming.StreamingWrite {

  import org.apache.spark.sql.connector.write.WriterCommitMessage
  import org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory

  override def createStreamingWriterFactory(
      info: org.apache.spark.sql.connector.write.PhysicalWriteInfo)
      : StreamingDataWriterFactory =
    new GraftLogWriterFactory(path, inputSchema, partitions, conf)

  private def epochMarker(epochId: Long): Path =
    new Path(new Path(path, "_epochs"), epochId.toString)

  private def stagedOf(messages: Array[WriterCommitMessage]) =
    messages.flatMap {
      case GraftLogTaskCommit(files) => files
      case _ => Nil
    }

  override def commit(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit = {
    val fs = new Path(path).getFileSystem(conf.value)
    val marker = epochMarker(epochId)
    val staged = stagedOf(messages)
    if (fs.exists(marker)) {
      // replayed epoch: already committed — drop the re-staged files
      staged.foreach(m => fs.delete(new Path(m.tmpPath), false))
      return
    }
    // CRASH-ATOMICITY: a driver death between the renames below and the
    // marker write would otherwise duplicate records on replay (the
    // replay re-stages the same rows and commit, finding no marker,
    // would rename them AFTER the partially-committed segments). The
    // epoch tag on every sink segment makes the whole commit
    // idempotent instead: wipe anything THIS epoch renamed in a dead
    // attempt, then redo all renames from the re-staged files. The
    // wipe-and-redo re-derives its base from the CURRENT end offset,
    // which is only sound under the single-writer contract documented
    // on GraftLog.append: an external producer segment racing into the
    // crash window would sit past the wiped range and the redo would
    // leave an unreadable offset hole. (Reusing the wiped segments'
    // original bases is no fix — a replay may re-stage the same rows in
    // a different file layout, so per-file counts need not line up.)
    GraftLog.partitionDirs(path, conf).foreach { case (_, dir) =>
      GraftLog.segments(dir, conf).foreach { case (_, s) =>
        if (GraftLog.segEpoch(s.getPath.getName).contains(epochId))
          fs.delete(s.getPath, false)
      }
    }
    // deterministic order: by (partition, temp name); each staged file
    // becomes one segment via RENAME (metadata-only). The partition's
    // current end is read ONCE per epoch (the active-segment read
    // latestOffset pays anyway); later bases ride the messages' record
    // counts, so commit never reads staged data.
    staged.groupBy(_.partition).toSeq.sortBy(_._1).foreach {
      case (p, files) =>
        val partDir = new Path(path, s"p$p")
        var base = GraftLog.endOffset(partDir, conf)
        files.sortBy(_.tmpPath).foreach { m =>
          val ok = fs.rename(new Path(m.tmpPath),
            new Path(partDir, GraftLog.epochSegName(base, epochId)))
          require(ok, s"rename failed for ${m.tmpPath} at base $base")
          base += m.lines
        }
    }
    fs.mkdirs(marker.getParent)
    fs.create(marker, false).close()
  }

  override def abort(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit = {
    val fs = new Path(path).getFileSystem(conf.value)
    stagedOf(messages).foreach(m => fs.delete(new Path(m.tmpPath), false))
  }
}

class GraftLogWriterFactory(path: String, inputSchema: StructType,
    partitions: Int, conf: SerializableHadoopConf)
  extends org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long, epochId: Long)
      : org.apache.spark.sql.connector.write.DataWriter[InternalRow] =
    new GraftLogDataWriter(path, inputSchema, partitions, conf,
      partitionId, taskId, epochId)
}

/** Buffers one open temp file per target log partition. The input may
  * carry any subset of (partition, timestamp, key, value) — missing
  * fields default (partition → hash(key), timestamp/key/value → null). */
class GraftLogDataWriter(path: String, inputSchema: StructType,
    partitions: Int, conf: SerializableHadoopConf, sparkPartitionId: Int,
    taskId: Long, epochId: Long)
  extends org.apache.spark.sql.connector.write.DataWriter[InternalRow] {

  private val fs = new Path(path).getFileSystem(conf.value)
  private def fieldIdx(name: String): Int = inputSchema.fieldNames.indexOf(name)
  private val pIdx = fieldIdx("partition")
  private val tsIdx = fieldIdx("timestamp")
  private val kIdx = fieldIdx("key")
  private val vIdx = fieldIdx("value")

  private val open = collection.mutable.Map.empty[
    Int, (org.apache.hadoop.fs.FSDataOutputStream, Path, Long)]

  private def js(s: String): String =
    if (s == null) "null"
    else "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  override def write(row: InternalRow): Unit = {
    val key = if (kIdx >= 0 && !row.isNullAt(kIdx))
      row.getUTF8String(kIdx).toString else null
    val p =
      if (pIdx >= 0 && !row.isNullAt(pIdx)) {
        val explicit = row.getInt(pIdx)
        // a negative value would route to a directory ("p-1") the p\d+
        // partition listing never reads — records would commit and then
        // silently never be readable. Fail loudly. (Values >= the
        // configured count mint a NEW partition directory — legal here:
        // the log's partition set is directory-defined and readers list
        // it, unlike Kafka's fixed topic width.)
        require(explicit >= 0,
          s"negative partition $explicit is unreadable (p$explicit " +
            "never matches the partition listing)")
        explicit
      }
      else if (key != null) math.floorMod(key.hashCode, partitions)
      else 0
    val (out, pp, n) = open.getOrElseUpdate(p, {
      val partDir = new Path(path, s"p$p")
      fs.mkdirs(partDir)
      val tmp = new Path(partDir,
        f".tmp-$epochId%d-$sparkPartitionId%05d-$taskId%d.jsonl")
      (fs.create(tmp, true), tmp, 0L)
    })
    val ts = if (tsIdx >= 0 && !row.isNullAt(tsIdx))
      row.getLong(tsIdx).toString else "null"
    val v = if (vIdx >= 0 && !row.isNullAt(vIdx))
      row.getUTF8String(vIdx).toString else null
    out.write(
      s"""{"timestamp":$ts,"key":${js(key)},"value":${js(v)}}\n"""
        .getBytes("UTF-8"))
    open.update(p, (out, pp, n + 1))
  }

  override def commit(): org.apache.spark.sql.connector.write.WriterCommitMessage = {
    open.values.foreach(_._1.close())
    // one message per task is the API shape; fold multi-partition
    // output into a composite
    val files = open.map { case (p, (_, pp, n)) =>
      GraftLogStagedFile(p, pp.toString, n)
    }.toSeq
    GraftLogTaskCommit(files)
  }

  override def abort(): Unit = {
    open.values.foreach { case (out, pp, _) =>
      try out.close() catch { case _: Exception => () }
      fs.delete(pp, false)
    }
  }

  override def close(): Unit = ()
}

case class GraftLogTaskCommit(files: Seq[GraftLogStagedFile])
  extends org.apache.spark.sql.connector.write.WriterCommitMessage

class GraftLogReaderFactory(conf: SerializableHadoopConf)
  extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val r = partition.asInstanceOf[GraftLogRange]
    new GraftLogPartitionReader(r, conf)
  }
}

/** Reads [startOffset, endOffset) of one partition: walks segments in
  * base order, validates contiguity (segment base must equal the
  * running offset — a gap means a corrupt log, and silently absorbing
  * it would mis-assign every later offset), skips to startOffset,
  * emits (partition, offset, timestamp, key, value). */
class GraftLogPartitionReader(range: GraftLogRange,
    conf: SerializableHadoopConf) extends PartitionReader[InternalRow] {

  private val parser = new JacksonParser(GraftLog.recordSchema,
    new JSONOptions(Map.empty[String, String], "UTC"), false, Nil)

  // seek: open at the last segment whose base <= startOffset (the
  // consumer-seek shape — replay cost is O(range), not O(log)); the
  // segments before it are never read
  private val segs: Seq[(Long, FileStatus)] = {
    val inRange = GraftLog.segments(new Path(range.partDir), conf)
      .filter { case (base, _) => base < range.endOffset }
    val firstIdx = inRange.lastIndexWhere(_._1 <= range.startOffset)
    inRange.drop(math.max(0, firstIdx))
  }

  private var segIdx = 0
  private var nextOffset = segs.headOption.map(_._1).getOrElse(0L)

  private var in: java.io.InputStream = _
  private var lines: Iterator[String] = Iterator.empty
  private var current: InternalRow = _

  private def openSeg(i: Int): Unit = {
    if (in != null) in.close()
    val (base, st) = segs(i)
    require(base == nextOffset,
      s"log ${range.partDir}: segment base $base breaks contiguity at " +
        s"offset $nextOffset — corrupt log")
    in = st.getPath.getFileSystem(conf.value).open(st.getPath)
    lines = scala.io.Source.fromInputStream(in, "UTF-8").getLines()
  }

  override def next(): Boolean = {
    while (nextOffset < range.endOffset) {
      if (!lines.hasNext) {
        if (segIdx >= segs.length) return false
        openSeg(segIdx)
        segIdx += 1
      } else {
        val line = lines.next()
        val off = nextOffset
        nextOffset += 1
        if (off >= range.startOffset) {
          // a malformed line still occupies its offset: NULL payload
          val payload =
            try parser.parse(line, CreateJacksonParser.string,
              UTF8String.fromString).headOption
            catch { case _: Exception => None }
          val row = new org.apache.spark.sql.catalyst.expressions
            .GenericInternalRow(5)
          row.setInt(0, range.partitionId)
          row.setLong(1, off)
          payload match {
            case Some(p) =>
              if (p.isNullAt(0)) row.setNullAt(2)
              else row.setLong(2, p.getLong(0))
              row.update(3, if (p.isNullAt(1)) null
                else p.getUTF8String(1).copy())
              row.update(4, if (p.isNullAt(2)) null
                else p.getUTF8String(2).copy())
            case None =>
              row.setNullAt(2); row.setNullAt(3); row.setNullAt(4)
          }
          current = row
          return true
        }
      }
    }
    false
  }

  override def get(): InternalRow = current

  override def close(): Unit = if (in != null) in.close()
}
