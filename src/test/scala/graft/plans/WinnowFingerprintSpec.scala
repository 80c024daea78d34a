package graft.plans

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.functions.{TextFunctions => T}
import graft.operators.Dedup

class WinnowFingerprintSpec extends SparkSpec {
  import spark.implicits._

  private def sketch(t: String, k: Int = 5, w: Int = 4): Seq[Long] =
    Seq(t).toDF("t").select(T.winnowFingerprint(col("t"), k, w).as("s"))
      .collect().head.getSeq[Long](0)

  test("deterministic; normalization-invariant; short/empty edge cases") {
    val a = sketch("the quick brown fox jumps over the lazy dog")
    assert(a === sketch("THE  quick brown fox jumps over the lazy  dog"))
    assert(a.nonEmpty)
    assert(sketch("ab") === sketch("ab")) // shorter than k: single hash
    assert(sketch("ab").length === 1)
    assert(sketch("") === Seq())
  }

  test("density: sketch much smaller than the k-gram count") {
    val text = ("spark winnows documents with rolling hashes " * 10).trim
    val s = sketch(text, 5, 8)
    val kgrams = text.length - 5 + 1
    assert(s.length < kgrams / 2, s"sketch ${s.length} vs $kgrams k-grams")
  }

  test("substring guarantee: long shared substring -> shared fingerprints") {
    val shared = "a very long distinctive common passage that both documents contain verbatim"
    val d1 = s"first document prologue. $shared. first epilogue"
    val d2 = s"completely different beginning text here. $shared. other ending"
    val s1 = sketch(d1).toSet
    val s2 = sketch(d2).toSet
    assert(s1.intersect(s2).nonEmpty)
    // character-disjoint text (no shared 5-grams — even one shared WORD
    // of length >= 5 would legitimately share fingerprints)
    val unrelated = sketch("zxq wkl pqv tuw ghjk bnmd fyrc uiop qwerty").toSet
    assert(s1.intersect(unrelated).isEmpty)
  }

  test("winnowOverlapPairs finds planted character-level near-dups") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (2L, "THE QUICK brown fox jumps over the lazy dog near the river bank today"), // normalization dup of 1
      (3L, "the quick brown fox leaps over the lazy dog near the river bank today"), // 1-word edit
      (4L, "entirely unrelated content about query optimizers and shuffle plans"))
      .toDF("doc_id", "text")
    val pairs = Dedup.winnowOverlapPairs(docs, "doc_id", "text",
      threshold = 0.4)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(pairs((1L, 2L)) === 1.0)
    assert(pairs.contains((1L, 3L)) && pairs((1L, 3L)) < 1.0)
    assert(!pairs.keySet.exists { case (a, b) => a == 4L || b == 4L })
  }

  test("overlap pairs on real documents include the planted near-dups") {
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
    val pairs = Dedup.winnowOverlapPairs(docs, "doc_id", "text",
      threshold = 0.6, maxBucket = 400)
    // the corpus has jaccard ~0.99 planted pairs; character-level
    // sketches must find pairs too
    assert(pairs.count() > 0)
  }
}
