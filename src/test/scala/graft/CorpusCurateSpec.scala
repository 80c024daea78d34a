package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

class CorpusCurateSpec extends SparkSpec {
  import spark.implicits._

  test("stage counts are monotone and near-dups are actually removed") {
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
    val (curated, stats) = CorpusCurate.curate(docs,
      minQuality = 0.1, langs = Nil, jaccard = 0.8)
    curated.count() // stats observe the first action on the plan
    val s = stats()
    assert(s.input === 500)
    assert(s.afterQuality <= s.input && s.afterLang <= s.afterQuality &&
      s.afterExact <= s.afterLang && s.afterNear <= s.afterExact)
    assert(s.afterNear < s.afterExact,
      "the corpus has planted near-dups; near-dedup must remove some")
    // no near-dup pairs remain in the curated output
    val residual = Dedup.minHashLshPairs(curated, "doc_id", "text",
      3, 64, 32, 0.8).count()
    assert(residual === 0)
  }

  test("semantic stage drops embedding near-dups the text stages miss") {
    // docs 1/2 share NO tokens (lexical dedup can't pair them) but
    // carry near-identical embeddings; doc 3 is lexically and
    // semantically distinct
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "one two three four five six seven eight nine ten"),
      (3L, "totally different text with nothing shared at all here"))
      .toDF("doc_id", "text")
    val embs = Seq(
      (1L, Seq(1.0f, 0.0f, 0.0f)),
      (2L, Seq(0.999f, 0.001f, 0.0f)),
      (3L, Seq(0.0f, 0.0f, 1.0f))).toDF("vec_id", "embedding")
    val (curated, stats) = CorpusCurate.curate(docs,
      minQuality = 0.0, langs = Nil, jaccard = 0.8,
      embeddings = Some(embs), semanticThreshold = 0.99, semanticK = 2)
    val kept = curated.select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq === Seq(1L, 3L)) // 2 collapses into 1
    val s = stats()
    assert(s.afterNear === 3 && s.afterSemantic === 2)
    // disabled stage: afterSemantic mirrors afterNear
    val (c2, stats2) = CorpusCurate.curate(docs,
      minQuality = 0.0, langs = Nil, jaccard = 0.8)
    c2.count()
    assert(stats2().afterSemantic === stats2().afterNear)
  }

  test("semantic stage with NO surviving vectors is a clean no-op") {
    // r7 removed the cents.isEmpty guard (capAssign handles the empty
    // frame); this pins that path: embeddings whose ids match no
    // surviving doc must drop nothing and not throw
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "totally different text with nothing shared at all here"))
      .toDF("doc_id", "text")
    val embs = Seq((999L, Seq(1.0f, 0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val (curated, stats) = CorpusCurate.curate(docs,
      minQuality = 0.0, langs = Nil, jaccard = 0.8,
      embeddings = Some(embs))
    assert(curated.select("doc_id").as[Long].collect().sorted.toSeq
      === Seq(1L, 2L))
    val s = stats()
    assert(s.afterSemantic === s.afterNear)
  }

  test("chains collapse to one representative") {
    val chain = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta iota"), // ~ 1
      (3L, "alpha beta gamma delta epsilon zeta mu iota"), // ~ 2
      (4L, "totally different text with nothing shared at all here"))
      .toDF("doc_id", "text")
    val (curated, _) = CorpusCurate.curate(chain,
      minQuality = 0.0, langs = Nil, jaccard = 0.4)
    val kept = curated.select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq === Seq(1L, 4L))
  }

  test("capped curation reports dropped band buckets; uncapped reports 0") {
    // 20 near-dup docs (unique head token, long shared tail) co-bucket
    // in most of the 32 bands — buckets of ~20 docs blow a cap of 2
    val near = (0L until 20L).map(i =>
      (i, s"u$i shared tail of the template body repeated across the " +
        "whole synthetic corpus for banding"))
      .toDF("doc_id", "text")
    val (cCap, statsCap) = CorpusCurate.curate(near, minQuality = 0.0,
      langs = Nil, jaccard = 0.8, maxBucket = 2)
    cCap.count()
    assert(statsCap().droppedBandBuckets > 0L,
      "cap of 2 on ~20-doc buckets must report dropped buckets")
    val (cUnc, statsUnc) = CorpusCurate.curate(near, minQuality = 0.0,
      langs = Nil, jaccard = 0.8)
    cUnc.count()
    assert(statsUnc().droppedBandBuckets === 0L)
  }

  test("repetition cap drops boilerplate; default 1.0 keeps it") {
    val docs = Seq(
      (1L, Seq.fill(40)("buy now").mkString(" ")), // rep ≈ 0.99
      (2L, "the quick brown fox jumps over the lazy dog today"))
      .toDF("doc_id", "text")
    def run(cap: Double) = {
      val (c, _) = CorpusCurate.curate(docs, minQuality = 0.0,
        langs = Nil, jaccard = 0.99, maxRepetition = cap)
      c.select("doc_id").as[Long].collect().toSet
    }
    assert(run(1.0) === Set(1L, 2L))
    assert(run(0.5) === Set(2L))
  }

  test("domain quota caps surviving docs per source, counted in stats") {
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
    val (curated, stats) = CorpusCurate.curate(docs,
      minQuality = 0.1, langs = Nil, jaccard = 0.8,
      maxPerDomain = 5)
    curated.count()
    val s = stats()
    val perSource = curated.groupBy("source").count()
      .as[(String, Long)].collect().toMap
    assert(perSource.values.forall(_ <= 5), perSource)
    assert(s.afterQuota === perSource.values.sum)
    assert(s.afterQuota <= s.afterSemantic)
    // disabled stage: afterQuota mirrors afterSemantic, no source column
    val (c2, stats2) = CorpusCurate.curate(docs,
      minQuality = 0.1, langs = Nil, jaccard = 0.8)
    c2.count()
    val s2 = stats2()
    assert(s2.afterQuota === s2.afterSemantic)
    assert(!c2.columns.contains("source"))
  }

  test("CLI default wires the N-SCALED hot-bucket cap (auto), not a " +
    "fixed gate constant") {
    import graft.operators.Dedup
    // no flag and the explicit "auto" spelling both resolve to
    // autoMaxBucket(n) — the production default scales with the corpus
    assert(CorpusCurate.resolveMaxBucket(None, 1000000000L) ===
      Dedup.autoMaxBucket(1000000000L))
    assert(CorpusCurate.resolveMaxBucket(Some("auto"), 1000000000L) ===
      Dedup.autoMaxBucket(1000000000L))
    // and it really is n-scaled (1B docs != the 2000 floor)
    assert(CorpusCurate.resolveMaxBucket(None, 1000000000L) ===
      400000)
    assert(CorpusCurate.resolveMaxBucket(None, 1000L) ===
      Dedup.autoMaxBucket(1000L)) // small corpus hits the floor
    // explicit opt-outs stay available: 0 disables, N pins
    assert(CorpusCurate.resolveMaxBucket(Some("0"), 1000000000L) === 0)
    assert(CorpusCurate.resolveMaxBucket(Some("777"), 1000000000L) === 777)
    // corpus size must be evaluated lazily — a pinned value must not
    // trigger the count() job
    var counted = false
    assert(CorpusCurate.resolveMaxBucket(Some("5"),
      { counted = true; 1L }) === 5)
    assert(!counted, "pinned cap must not force a corpus count")
  }

  test("decontamination drops docs sharing n-grams with the bench set") {
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
    // bench set = verbatim copies of two corpus docs (worst-case leak)
    val bench = docs.filter(col("doc_id").isin(3L, 17L))
      .select(col("doc_id").as("bench_id"), col("text"))
      .withColumnRenamed("bench_id", "doc_id")
    val (curated, stats) = CorpusCurate.curate(docs,
      minQuality = 0.1, langs = Nil, jaccard = 0.8,
      bench = Some(bench), minBenchOverlap = 8)
    curated.count()
    val s = stats()
    assert(s.afterDecon < s.afterSemantic,
      s"verbatim bench leaks must be dropped: $s")
    val kept = curated.select("doc_id").as[Long].collect().toSet
    assert(!kept.contains(3L) && !kept.contains(17L))
    // a run without the stage reports the pass-through count
    val (c2, stats2) = CorpusCurate.curate(docs,
      minQuality = 0.1, langs = Nil, jaccard = 0.8)
    c2.count()
    assert(stats2().afterDecon === stats2().afterSemantic)
  }
}
