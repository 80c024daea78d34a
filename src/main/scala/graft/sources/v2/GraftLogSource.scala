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
      .filter(_.getPath.getName.matches("\\d{20}\\.jsonl"))
      .map(s => s.getPath.getName.stripSuffix(".jsonl").toLong -> s)
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
    * so the layout contract lives in one place.) */
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
}

class GraftLogSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-log"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GraftLog.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new GraftLogTable(properties.get("path"))
}

class GraftLogTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"graft_log($path)"
  override def schema(): StructType = GraftLog.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new GraftLogScan(path,
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
