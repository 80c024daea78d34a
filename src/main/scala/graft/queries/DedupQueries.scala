package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.{TextFunctions => T}
import graft.operators.{Dedup, SimilaritySearch}

/** Dedup + similarity queries over `documents`/`embeddings`.
  *
  * d01/d02/d03/d05 carry exact DuckDB oracles. d03 (MinHash-LSH) is
  * oracle-checked against the EXACT jaccard pair set: with r=2/bands=32
  * the catch probability at j>=0.8 is 1-(1-0.8²)^32 ≈ 1-10⁻¹⁴, and
  * candidates are verified with exact jaccard, so LSH output == exact
  * output (validated empirically at sf0.01 and sf0.1). d04 (SimHash) and
  * s01 (ANN) depend on Spark's xxhash64/seeded hyperplanes, which DuckDB
  * cannot reproduce → rows-only checks.
  */
object DedupQueries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")
  private def emb(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "embeddings")

  private def d01(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).agg(count(lit(1)).as("total_docs"),
      countDistinct(T.fingerprint(col("text"))).as("kept_docs"))

  private def d02(s: SparkSession, dir: String): DataFrame =
    Dedup.ngramJaccardPairs(docs(s, dir), "doc_id", "text", n = 3)
      .filter(col("jaccard") >= 0.8)
      .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 4).as("jaccard"))
      .orderBy("doc_a", "doc_b")

  private def d03(s: SparkSession, dir: String): DataFrame =
    Dedup.minHashLshPairs(docs(s, dir), "doc_id", "text",
      n = 3, numHashes = 64, bands = 32, threshold = 0.8)
      .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 4).as("jaccard"))
      .orderBy("doc_a", "doc_b")

  private def d04(s: SparkSession, dir: String): DataFrame =
    Dedup.simHashPairs(docs(s, dir), "doc_id", "text", maxHamming = 3)
      .orderBy("doc_a", "doc_b")

  private def d05(s: SparkSession, dir: String): DataFrame =
    Dedup.cosinePairsBrute(emb(s, dir), "vec_id", "embedding", 0.4)
      .select(col("id_a"), col("id_b"), round(col("cosine"), 4).as("cosine"))
      .orderBy(col("cosine").desc, col("id_a"), col("id_b"))

  private def s01(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val queryVec = e.filter(col("vec_id") === 1)
      .select("embedding").collect().head.getSeq[Float](0)
    val index = SimilaritySearch.ivfIndex(e, "vec_id", "embedding",
      dim = 64, planes = 4, tables = 8)
    SimilaritySearch.annTopK(index, queryVec, dim = 64, k = 10,
      planes = 4, tables = 8)
      .select(col("id").as("vec_id"), round(col("score"), 4).as("score"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "d01_exact_dedup_docs" -> (d01 _),
    "d02_ngram_jaccard" -> (d02 _),
    "d03_minhash_lsh" -> (d03 _),
    "d04_simhash_pairs" -> (d04 _),
    "d05_embed_cosine_pairs" -> (d05 _),
    "s01_ann_topk" -> (s01 _),
  )

  // shared CTE: case-normalized distinct trigram shingles per doc
  private val shingleCte =
    "WITH toks AS (SELECT doc_id, " +
      "list_filter(string_split_regex(trim(lower(text)), '\\s+'), t -> t <> '') AS tk " +
      "FROM documents), " +
      "sh AS (SELECT doc_id, unnest(list_distinct(" +
      "CASE WHEN len(tk) >= 3 THEN list_transform(range(1, len(tk)-1), " +
      "i -> array_to_string(tk[i:i+2], ' ')) " +
      "WHEN len(tk) > 0 THEN [array_to_string(tk, ' ')] " +
      "ELSE [] END)) AS s FROM toks), " +
      "sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id), " +
      "inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i " +
      "FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id " +
      "GROUP BY doc_a, doc_b), " +
      "j AS (SELECT doc_a, doc_b, " +
      "i * 1.0 / (sa.sz + sb.sz - i) AS jac FROM inter " +
      "JOIN sizes sa ON doc_a = sa.doc_id JOIN sizes sb ON doc_b = sb.doc_id) "

  private val jaccardPairsSql = shingleCte +
    "SELECT doc_a, doc_b, round(jac, 4) AS jaccard FROM j " +
    "WHERE jac >= 0.8 ORDER BY doc_a, doc_b"

  private val cosinePairsSql =
    "WITH v AS (SELECT vec_id, generate_subscripts(embedding, 1) AS i, " +
      "CAST(unnest(embedding) AS DOUBLE) AS x FROM embeddings), " +
      "n AS (SELECT vec_id, sqrt(sum(x*x)) AS nm FROM v GROUP BY vec_id), " +
      "d AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b, sum(a.x*b.x) AS dot " +
      "FROM v a JOIN v b ON a.i = b.i AND a.vec_id < b.vec_id GROUP BY id_a, id_b), " +
      "c AS (SELECT id_a, id_b, dot / (na.nm * nb.nm) AS cosv FROM d " +
      "JOIN n na ON id_a = na.vec_id JOIN n nb ON id_b = nb.vec_id) " +
      "SELECT id_a, id_b, round(cosv, 4) AS cosine FROM c WHERE cosv >= 0.4 " +
      "ORDER BY cosine DESC, id_a, id_b"

  val oracleSql: Map[String, String] = Map(
    "d01_exact_dedup_docs" ->
      ("SELECT count(*) AS total_docs, " +
        "count(DISTINCT md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))) AS kept_docs " +
        "FROM documents"),
    "d02_ngram_jaccard" -> jaccardPairsSql,
    "d03_minhash_lsh" -> jaccardPairsSql,
    "d05_embed_cosine_pairs" -> cosinePairsSql,
    // d04_simhash_pairs, s01_ann_topk: hash-seeded, rows-only check
  )
}
