package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Multimodal

/** Multimodal-plumbing queries: binary payload columns with typed
  * metadata, distributed batch feature extraction (decode STUBBED — see
  * Multimodal.decodeStub). Payload bytes are deterministic (UTF-8 of
  * ASCII text), so even the mapPartitions feature path has an exact
  * DuckDB oracle.
  */
object MultimodalQueries {

  private def media(s: SparkSession, dir: String): DataFrame =
    Multimodal.fakePayloads(Tables(s, dir, "documents"))

  private def mm01(s: SparkSession, dir: String): DataFrame =
    media(s, dir).select(col("doc_id"),
      length(col("payload")).as("payload_bytes"),
      col("kind"), col("width"), col("height"))
      .orderBy("doc_id").limit(100)

  private def mm02(s: SparkSession, dir: String): DataFrame =
    Multimodal.extractFeatures(media(s, dir))
      .select("doc_id", "byte_len", "byte_sum", "n_frames")
      .orderBy("doc_id").limit(100)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm01_payload_meta" -> (mm01 _),
    "mm02_decode_features" -> (mm02 _),
  )

  val oracleSql: Map[String, String] = Map(
    "mm01_payload_meta" ->
      ("SELECT doc_id, octet_length(encode(text)) AS payload_bytes, " +
        "(['image','audio','video'])[CAST(doc_id % 3 + 1 AS INT)] AS kind, " +
        "CAST(doc_id % 640 + 64 AS INT) AS width, " +
        "CAST(doc_id % 480 + 48 AS INT) AS height " +
        "FROM documents ORDER BY doc_id LIMIT 100"),
    "mm02_decode_features" ->
      ("SELECT doc_id, octet_length(encode(text)) AS byte_len, " +
        "CAST(list_sum(list_transform(range(1, length(text)+1), " +
        "i -> ord(substr(text, i, 1)))) AS BIGINT) AS byte_sum, " +
        "CAST(greatest(1, octet_length(encode(text)) // 256) AS INT) AS n_frames " +
        "FROM documents ORDER BY doc_id LIMIT 100"),
  )
}
