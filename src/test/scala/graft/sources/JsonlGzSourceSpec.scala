package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the gzipped-JSONL semantics the src03 gate depends on:
  * DROPMALFORMED skips the truncated line (and ONLY it), nested
  * struct/array fields project under the explicit schema, missing
  * fields read as NULL, unicode survives, and — the scale fact — gzip
  * is NOT splittable, so the scan plans exactly one partition per
  * shard file (parallelism at 100 TB comes from upstream sharding,
  * not from Spark splitting). */
class JsonlGzSourceSpec extends SparkSpec {

  private val schema = "doc_id BIGINT, source STRING, lang STRING, " +
    "published DATE, title STRING, " +
    "meta STRUCT<views: BIGINT, tags: ARRAY<STRING>>, score DOUBLE"

  private lazy val df = spark.read
    .schema(schema)
    .option("mode", "DROPMALFORMED")
    .json(graft.GraftSession.fixture("docs_export_jsonl"))

  test("malformed line is skipped; all 45 valid rows survive") {
    assert(df.count() === 45)
    assert(df.filter(col("doc_id") === 999).count() === 0)
    assert(df.filter(col("doc_id").isNull).count() === 0)
  }

  test("nested struct/array project; missing + null fields read NULL") {
    val r1 = df.filter(col("doc_id") === 1)
      .select(col("meta.views"), size(col("meta.tags")), col("score"))
      .head()
    assert(r1.getLong(0) === 37L)
    assert(r1.getInt(1) === 2)
    // doc 11: score field ABSENT from the JSON object -> NULL
    assert(df.filter(col("doc_id") === 11).select("score").head()
      .isNullAt(0))
    // doc 3: lang is JSON null -> NULL
    assert(df.filter(col("doc_id") === 3).select("lang").head().isNullAt(0))
    // doc 4: i % 4 == 0 -> empty tags array, size 0 (not NULL)
    assert(df.filter(col("doc_id") === 4)
      .select(size(col("meta.tags"))).head().getInt(0) === 0)
  }

  test("unicode titles survive the gzip + utf-8 round trip") {
    val t7 = df.filter(col("doc_id") === 7).select("title").head()
      .getString(0)
    assert(t7 === "Doc 7 — \"quoted\" título")
  }

  test("gzip is not splittable: exactly one partition per shard file") {
    // 3 .jsonl.gz shards -> 3 input partitions, regardless of
    // maxPartitionBytes; a splittable codec would fan out further
    assert(df.rdd.getNumPartitions === 3)
  }
}
