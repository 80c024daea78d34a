package graft.sources.v2

import java.util

import scala.jdk.CollectionConverters._

import java.util.OptionalLong

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.json.{CreateJacksonParser, JacksonParser, JSONOptions}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.metric.{CustomMetric, CustomSumMetric, CustomTaskMetric}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, GreaterThan, GreaterThanOrEqual, In, IsNotNull, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.sources.SquareOrders

/** DataSource V2 connector for Square-style order documents — the
  * "proper version" of SURVEY.md S1–S4.
  *
  * Models the reference connector's behavior
  * (`square_service.py:138-276`): one fetch stream per location
  * (`:317-360` → one InputPartition per location file), server-side
  * pushdown of the date-range/state predicates into the API request body
  * (`:211-231` → SupportsPushDownFilters), and the test-mode order cap
  * (`:201-209` → SupportsPushDownLimit, applied PER LOCATION like the
  * reference's per-location page cap).
  *
  * Layout: a directory of `<square_location_id>.jsonl` files, each one
  * location's order documents (the shape a paginated fetcher would have
  * persisted). In production the PartitionReader's file-read loop is
  * where the HTTPS pagination loop would live; everything else —
  * planning, pushdown, schema — is identical.
  *
  * Usage: `spark.read.format("square-orders").load(dir)` (or the full
  * class name). RFC3339 `closed_at` strings compare lexicographically =
  * chronologically, so range pushdown is a string compare, exactly like
  * the API's `start_at`/`end_at` body parameters.
  */
class SquareOrdersSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "square-orders"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SquareOrders.orderSchema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new SquareOrdersTable(properties.get("path"))
}

class SquareOrdersTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"square_orders($path)"
  override def schema(): StructType = SquareOrders.orderSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SquareScanBuilder(path)
}

class SquareScanBuilder(path: String)
  extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownLimit {

  private var pushed: Array[Filter] = Array.empty
  private var limit: Int = -1

  /** Accept the predicates the Square API accepts server-side:
    * location equality/membership, state equality, closed_at range.
    * Everything else stays a residual for Spark to evaluate. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, residual) = filters.partition {
      case EqualTo("location_id", _) | In("location_id", _) => true
      case EqualTo("state", _) => true
      case GreaterThan("closed_at", _) | GreaterThanOrEqual("closed_at", _) |
           LessThan("closed_at", _) | LessThanOrEqual("closed_at", _) => true
      case IsNotNull("location_id" | "state" | "closed_at") => true
      case _ => false
    }
    pushed = accepted
    residual
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def pushLimit(l: Int): Boolean = {
    limit = l
    true
  }

  /** The limit is applied PER PARTITION (per location file, like the
    * reference's per-location page cap) — declare partial pushdown so
    * the optimizer must keep the global Limit. Relying on Spark
    * retaining it for a fully-pushed limit is version-fragile. */
  override def isPartiallyPushed(): Boolean = true

  override def build(): Scan = {
    // session Hadoop conf, not a bare new Configuration(): filesystem
    // settings/credentials configured on the SparkSession (e.g. S3A
    // keys) must reach both planning and the executor-side readers
    val conf = new SerializableHadoopConf(
      org.apache.spark.sql.SparkSession.active.sessionState.newHadoopConf())
    new SquareScan(path, pushed, limit, conf)
  }
}

/** Minimal serializable carrier for a Hadoop Configuration (Spark's own
  * SerializableConfiguration is private[spark]). */
class SerializableHadoopConf(@transient var value: org.apache.hadoop.conf.Configuration)
  extends Serializable {
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new org.apache.hadoop.conf.Configuration(false)
    value.readFields(in)
  }
}

/** Driver-side metric: sum of per-task malformed-line counts — the
  * reference's log-and-skip tolerance, now observable per query in the
  * metrics UI instead of silently swallowed. */
class MalformedLinesMetric extends CustomSumMetric {
  override def name(): String = "malformedLines"
  override def description(): String = "skipped malformed order lines"
}

case class MalformedLinesTaskMetric(value: Long) extends CustomTaskMetric {
  override def name(): String = "malformedLines"
}

class SquareScan(path: String, filters: Array[Filter], limit: Int,
    conf: SerializableHadoopConf)
  extends Scan with Batch with SupportsReportStatistics {

  override def readSchema(): StructType = SquareOrders.orderSchema

  /** Location-pruned file listing — shared by partition planning and
    * statistics so both see the same surviving files. */
  private def locationFiles(): Array[org.apache.hadoop.fs.FileStatus] = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf.value)
    // ALL accepted location predicates prune (intersection) — every
    // accepted filter was removed from Spark's plan, so applying only
    // the first (collectFirst) would silently drop the others (e.g.
    // location_id IN ('a','b') AND location_id = 'a' must read only a)
    val locFilters: Seq[String => Boolean] = filters.toSeq.collect {
      case EqualTo("location_id", v) => (loc: String) => loc == v.toString
      case In("location_id", vs) =>
        val set = vs.map(_.toString).toSet
        (loc: String) => set(loc)
    }
    fs.listStatus(p).filter(_.getPath.getName.endsWith(".jsonl"))
      .filter(f => locFilters
        .forall(_(f.getPath.getName.stripSuffix(".jsonl"))))
  }

  /** Planning-time size estimate from the location-PRUNED file listing
    * (same pruning as planInputPartitions) — the cost-based planner's
    * input for join-side selection; an unpruned size would stop a tiny
    * single-location scan from being broadcast. */
  override def estimateStatistics(): Statistics = new Statistics {
    private lazy val bytes: Long =
      try locationFiles().map(_.getLen).sum
      catch { case _: Exception => 0L }
    override def sizeInBytes(): OptionalLong =
      if (bytes > 0) OptionalLong.of(bytes) else OptionalLong.empty()
    override def numRows(): OptionalLong = OptionalLong.empty()
  }

  override def supportedCustomMetrics(): Array[CustomMetric] =
    Array(new MalformedLinesMetric)

  override def description(): String =
    s"SquareOrdersScan path=$path " +
      s"PushedFilters=[${filters.mkString(", ")}] limit=$limit"

  override def toBatch: Batch = this

  /** S4: one partition per location file — location pruning happens HERE,
    * at planning time (the reference simply doesn't call the API for
    * filtered-out locations). */
  override def planInputPartitions(): Array[InputPartition] =
    locationFiles()
      .map(_.getPath)
      .sortBy(_.getName)
      .map(f => SquareInputPartition(f.toString): InputPartition)

  override def createReaderFactory(): PartitionReaderFactory =
    new SquareReaderFactory(filters, limit, conf)
}

case class SquareInputPartition(file: String) extends InputPartition

class SquareReaderFactory(filters: Array[Filter], limit: Int,
    conf: SerializableHadoopConf)
  extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new SquarePartitionReader(
      partition.asInstanceOf[SquareInputPartition].file, filters, limit, conf)
}

/** Streams one location's documents: read line → parse (Spark's own
  * JacksonParser against the fixed schema) → apply pushed predicates →
  * honor the per-location limit. Malformed lines are skipped with a
  * count, matching the reference's log-and-skip tolerance. */
class SquarePartitionReader(file: String, filters: Array[Filter], limit: Int,
    conf: SerializableHadoopConf)
  extends PartitionReader[InternalRow] {

  private val schema = SquareOrders.orderSchema
  private val stateOrd = schema.fieldIndex("state")
  private val closedOrd = schema.fieldIndex("closed_at")

  private val parser = new JacksonParser(schema,
    new JSONOptions(Map.empty[String, String], "UTC"), false, Nil)

  private val fsPath = new Path(file)
  private val in = fsPath.getFileSystem(conf.value).open(fsPath)
  private val lines = scala.io.Source.fromInputStream(in, "UTF-8").getLines()

  private var current: InternalRow = _
  private var emitted = 0
  var malformed = 0

  private val locOrd = schema.fieldIndex("location_id")

  // EVERY accepted filter must be enforced here (or by file pruning):
  // accepted filters are removed from Spark's plan, so an accepted-but-
  // unenforced predicate returns wrong rows, not just extra work.
  // location predicates are enforced at row level too — file-name
  // pruning assumes each document's embedded location_id matches its
  // file, and a mismatched document must not leak through a filter.
  private val rowPredicates: Array[InternalRow => Boolean] = filters.collect {
    case IsNotNull(c @ ("location_id" | "state" | "closed_at")) =>
      val ord = schema.fieldIndex(c)
      (r: InternalRow) => !r.isNullAt(ord)
    case EqualTo("location_id", v) =>
      val u = UTF8String.fromString(v.toString)
      (r: InternalRow) => !r.isNullAt(locOrd) && r.getUTF8String(locOrd) == u
    case In("location_id", vs) =>
      val set = vs.map(v => UTF8String.fromString(v.toString)).toSet
      (r: InternalRow) => !r.isNullAt(locOrd) && set(r.getUTF8String(locOrd))
    case EqualTo("state", v) =>
      val u = UTF8String.fromString(v.toString)
      (r: InternalRow) => !r.isNullAt(stateOrd) && r.getUTF8String(stateOrd) == u
    case GreaterThanOrEqual("closed_at", v) =>
      val u = UTF8String.fromString(v.toString)
      (r: InternalRow) => !r.isNullAt(closedOrd) && r.getUTF8String(closedOrd).compareTo(u) >= 0
    case GreaterThan("closed_at", v) =>
      val u = UTF8String.fromString(v.toString)
      (r: InternalRow) => !r.isNullAt(closedOrd) && r.getUTF8String(closedOrd).compareTo(u) > 0
    case LessThanOrEqual("closed_at", v) =>
      val u = UTF8String.fromString(v.toString)
      (r: InternalRow) => !r.isNullAt(closedOrd) && r.getUTF8String(closedOrd).compareTo(u) <= 0
    case LessThan("closed_at", v) =>
      val u = UTF8String.fromString(v.toString)
      (r: InternalRow) => !r.isNullAt(closedOrd) && r.getUTF8String(closedOrd).compareTo(u) < 0
  }

  override def next(): Boolean = {
    if (limit >= 0 && emitted >= limit) return false
    while (lines.hasNext) {
      val line = lines.next()
      if (line.trim.nonEmpty) {
        val parsed =
          try parser.parse(line, CreateJacksonParser.string, UTF8String.fromString)
          catch { case _: Exception => malformed += 1; Nil }
        parsed.headOption match {
          case Some(row) if rowPredicates.forall(_(row)) =>
            current = row.copy()
            emitted += 1
            return true
          case _ => ()
        }
      }
    }
    false
  }

  override def get(): InternalRow = current

  override def currentMetricsValues(): Array[CustomTaskMetric] =
    Array(MalformedLinesTaskMetric(malformed))

  override def close(): Unit = in.close()
}
