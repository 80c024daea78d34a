package graft.sources

import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.classic.GraftStreamBridge
import org.apache.spark.sql.execution.streaming.{Offset => V1Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.{LongOffset, SerializedOffset}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.operators.ManifestTable

/** Structured Streaming SOURCE over a [[graft.operators.ManifestTable]]
  * — the table is now both ends of an incremental pipeline (the sink
  * half is `StreamingEtl.writeBatchManifest`): a downstream job
  * `readStream.format("graft-manifest").load(path)` and each
  * micro-batch delivers exactly the rows committed since the last
  * checkpointed offset. OFFSETS ARE MANIFEST VERSIONS — the one number
  * the commit protocol already makes atomic, totally ordered, and
  * replayable, so restart-exactly-once falls out of the checkpoint for
  * free (a replayed batch re-reads the same immutable version range).
  *
  * Per micro-batch I/O is the version range's ADDED FILES only — the
  * [[ManifestTable.readChanges]] file-list delta, never a table scan:
  * at 100 TB a nightly consumer reads the night's arrivals, and the
  * polling `getOffset` is one driver-side directory listing (no data
  * I/O at all when nothing committed).
  *
  * Options:
  *  - `startingVersion` (long): deliver changes AFTER this version
  *    instead of an initial whole-snapshot batch. Must be retained.
  *  - `mode` = `append-only` (default) | `cdc` | `ignore-rewrites`:
  *    what a maintenance rewrite (compact/delete/upsert) inside a
  *    batch's version range does. `append-only` FAILS THE QUERY loudly
  *    (the readChanges contract — never silently duplicate);
  *    `cdc` delivers the row-level [[ManifestTable.diffSnapshots]]
  *    feed with a `_change` column ('insert'/'delete' — deletes carry
  *    the OLD values), so even rewrites stream exactly; `ignore-
  *    rewrites` delivers added files as-is (rewritten survivors arrive
  *    again — the Delta `ignoreChanges` duplicates contract).
  *
  * Retention contract: [[ManifestTable.vacuum]]'s `keepVersions` (or a
  * [[ManifestTable.tag]] pin) must cover the slowest consumer's lag,
  * or its next batch fails loudly on the vacuumed version — never a
  * silent re-read of the world. The table must exist when the stream
  * is DEFINED (schema comes from the current snapshot).
  */
class ManifestStreamSource extends StreamSourceProvider
    with DataSourceRegister {

  override def shortName(): String = "graft-manifest"

  override def sourceSchema(sql: SQLContext, schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): (String, StructType) =
    (shortName(), ManifestStreamSource.schemaOf(sql, schema, parameters))

  override def createSource(sql: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source =
    new ManifestSource(sql, ManifestStreamSource.pathOf(parameters),
      ManifestStreamSource.modeOf(parameters),
      parameters.get("startingVersion").map(_.trim.toLong),
      ManifestStreamSource.schemaOf(sql, schema, parameters))
}

private[sources] object ManifestStreamSource {
  val AppendOnly = "append-only"
  val Cdc = "cdc"
  val IgnoreRewrites = "ignore-rewrites"

  def pathOf(parameters: Map[String, String]): String =
    parameters.getOrElse("path", sys.error(
      "graft-manifest source requires .load(<table path>)"))

  def modeOf(parameters: Map[String, String]): String = {
    val m = parameters.getOrElse("mode", AppendOnly).trim.toLowerCase
    require(Set(AppendOnly, Cdc, IgnoreRewrites)(m),
      s"graft-manifest mode '$m' is not one of: " +
        s"$AppendOnly, $Cdc, $IgnoreRewrites")
    m
  }

  /** Declared stream schema: the table's current snapshot schema (or
    * the user's), plus `_change` in cdc mode. Captured at stream
    * definition; later batches are projected onto it by name. */
  def schemaOf(sql: SQLContext, userSchema: Option[StructType],
      parameters: Map[String, String]): StructType = {
    val base = userSchema.getOrElse(
      ManifestTable.read(sql.sparkSession, pathOf(parameters)).schema)
    if (modeOf(parameters) == Cdc && !base.fieldNames.contains("_change"))
      StructType(base.fields :+ StructField("_change", StringType,
        nullable = false))
    else base
  }
}

private[sources] class ManifestSource(sql: SQLContext, path: String,
    mode: String, startingVersion: Option[Long],
    declaredSchema: StructType) extends Source {
  import ManifestStreamSource._

  override def schema: StructType = declaredSchema

  /** Latest available offset = current manifest version: one
    * driver-side listing per poll, no data I/O. */
  override def getOffset: Option[V1Offset] = {
    val (v, _) = ManifestTable.currentManifest(sql.sparkSession, path)
    if (v <= 0L) None else Some(LongOffset(v))
  }

  // a restarted query hands back the checkpointed JSON as a
  // SerializedOffset; LongOffset's json is the bare number
  private def versionOf(o: V1Offset): Long = o match {
    case l: LongOffset     => l.offset
    case s: SerializedOffset => s.json.trim.toLong
    case other             => other.json.trim.toLong
  }

  override def getBatch(start: Option[V1Offset], end: V1Offset): DataFrame = {
    val spark = sql.sparkSession
    val to = versionOf(end)
    val batch = start.map(versionOf).orElse(startingVersion) match {
      case None => // first batch, no startingVersion: the whole snapshot
        val snap = ManifestTable.read(spark, path, version = Some(to))
        if (mode == Cdc) snap.withColumn("_change", lit("insert")) else snap
      case Some(f) if mode == Cdc =>
        ManifestTable.diffSnapshots(spark, path, f, to)
      case Some(f) =>
        ManifestTable.readChanges(spark, path, f, to,
          ignoreRewrites = mode == IgnoreRewrites)
    }
    // project onto the declared schema by name (a schema-evolving
    // append adds columns mid-stream; the stream's shape is fixed at
    // definition) and re-wrap as a streaming frame for the engine
    GraftStreamBridge.asStreaming(
      batch.select(declaredSchema.fieldNames.map(col).toSeq: _*))
  }

  override def commit(offset: V1Offset): Unit = () // retention is vacuum's

  override def stop(): Unit = ()

  override def toString: String =
    s"ManifestSource[$path, mode=$mode" +
      startingVersion.fold("")(v => s", startingVersion=$v") + "]"
}
