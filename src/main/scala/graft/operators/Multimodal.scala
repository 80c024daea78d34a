package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque BINARY payloads
  * with typed metadata, processed in distributed batches.
  *
  * The Spark-side shape is real and tested — schema, partition-parallel
  * batch processing, feature output — while the actual media decoding is
  * STUBBED with a deterministic fake (no image/audio codecs in this
  * environment). Swapping `decodeStub` for a real decoder (JNI/FFI or a
  * Python `mapInPandas` stage) changes nothing structurally: the operator
  * is a `mapPartitions` over (id, payload, meta) batches either way.
  *
  * Scale notes: payloads never pass through a shuffle here — features are
  * computed scan-side and only the (small) feature rows move on. For real
  * media at 100 TB the payload column would live in its own parquet column
  * chunk (columnar pruning keeps metadata-only queries from reading bytes).
  */
object Multimodal {

  case class MediaRow(doc_id: Long, payload: Array[Byte], kind: String,
      width: Int, height: Int)

  case class MediaFeatures(doc_id: Long, kind: String, byte_len: Int,
      byte_sum: Long, n_frames: Int, hist: Seq[Long])

  /** Deterministic fake payloads from the documents table: UTF-8 bytes of
    * the text stand in for encoded media; metadata derived from doc_id. */
  def fakePayloads(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      (col("doc_id") % 640 + 64).cast("int").as("width"),
      (col("doc_id") % 480 + 48).cast("int").as("height"))

  /** ===== STUB DECODE =====
    * Stands in for a real image/audio/video decode. Deterministic fake:
    * "decoding" reads the raw bytes; features are byte length, byte sum,
    * a fake frame count (1 frame per 256 bytes), and a 16-bucket byte
    * histogram. The mapPartitions batch shape (iterator-in/iterator-out,
    * one JVM-side pass per partition) is exactly what a real codec needs. */
  def decodeStub(bytes: Array[Byte]): (Int, Long, Int, Array[Long]) = {
    val hist = new Array[Long](16)
    var sum = 0L
    var i = 0
    while (i < bytes.length) {
      sum += bytes(i) & 0xFF
      hist((bytes(i) & 0xFF) / 16) += 1
      i += 1
    }
    (bytes.length, sum, math.max(1, bytes.length / 256), hist)
  }

  /** Distributed feature extraction over media payloads. */
  def extractFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("doc_id", "payload", "kind", "width", "height")
      .as[MediaRow]
      .mapPartitions { rows =>
        rows.map { r =>
          val (len, sum, frames, hist) = decodeStub(r.payload)
          MediaFeatures(r.doc_id, r.kind, len, sum, frames, hist.toSeq)
        }
      }
  }

  /** Metadata-only "resize": the payload is untouched (a real impl would
    * re-encode in the same mapPartitions pass); target dims recorded. */
  def resizeMeta(media: DataFrame, maxW: Int, maxH: Int): DataFrame = {
    val scale = least(lit(1.0), least(lit(maxW) / col("width"),
      lit(maxH) / col("height")))
    media.withColumn("out_width", floor(col("width") * scale).cast("int"))
      .withColumn("out_height", floor(col("height") * scale).cast("int"))
  }

  /** Frame sampling plan for video rows: every `stride`-th fake frame. */
  def sampleFrames(features: Dataset[MediaFeatures], stride: Int): DataFrame = {
    val spark = features.sparkSession
    import spark.implicits._
    features.filter(_.kind == "video")
      .flatMap(f => (0 until f.n_frames by stride)
        .map(i => (f.doc_id, i)))
      .toDF("doc_id", "frame_idx")
  }
}
