package graft.operators

import scala.util.Random

import graft.SparkSpec

class BpeTrainSpec extends SparkSpec {
  import spark.implicits._

  // the BPE paper's canonical corpus (Sennrich et al. 2016, public
  // literature): lowest-loss merges are e+s, es+t, then l+o ...
  private lazy val paperWords = Map(
    "low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)

  private def wordsDf(m: Map[String, Long]) =
    m.toSeq.toDF("word", "freq")

  test("train: reproduces the paper example merge sequence") {
    // localThreshold = 0 forces the distributed loop — these
    // distributed==reference comparisons must not short-circuit into
    // comparing trainLocal with itself
    val merges = BpeTrain.train(spark, wordsDf(paperWords), 4,
      localThreshold = 0)
    // e+s (6+3=9), es+t (9), est+? no — w,e in newest/lower... the exact
    // sequence is pinned by the in-memory reference implementation:
    assert(merges === BpeTrain.trainLocal(paperWords, 4))
    assert(merges.take(2) === Seq(("e", "s"), ("es", "t")))
  }

  test("train: distributed == in-memory reference on random corpora") {
    val rnd = new Random(42)
    (1 to 3).foreach { _ =>
      val words = (1 to 30).map { _ =>
        val len = 1 + rnd.nextInt(6)
        val w = (1 to len).map(_ => ('a' + rnd.nextInt(4)).toChar).mkString
        w
      }.groupBy(identity).map { case (w, ws) => w -> ws.size.toLong }
      val expected = BpeTrain.trainLocal(words, 8)
      val got = BpeTrain.train(spark, wordsDf(words), 8,
        localThreshold = 0)
      assert(got === expected)
    }
  }

  test("train: distributed == reference on non-ASCII incl. astral plane") {
    // U+10000 (astral: UTF-16 surrogates 0xD800.. sort BELOW U+E000, but
    // UTF-8/code-point order sorts it ABOVE) — the exact boundary where
    // UTF-16 and UTF-8 tie-break orders diverge
    val astral = new String(Character.toChars(0x10000))
    val priv = ""
    val words = Map(s"${astral}a" -> 1L, s"${priv}a" -> 1L,
      "café" -> 2L, s"$astral$priv" -> 1L)
    val expected = BpeTrain.trainLocal(words, 6)
    val got = BpeTrain.train(spark, wordsDf(words), 6,
      localThreshold = 0)
    assert(got === expected)
    // the (é-free) tie (astral,a) vs (priv,a) must resolve to priv first
    // under UTF-8 byte order
    assert(expected.contains((priv, "a")))
    assert(expected.indexOf((priv, "a")) < expected.indexOf((astral, "a")))
    // code-point split: astral symbols survive as whole 2-char strings
    assert(BpeTrain.toSymbols(s"$astral$priv") === Seq(astral, priv))
  }

  test("train: stops early when no pairs remain") {
    val merges = BpeTrain.train(spark, wordsDf(Map("ab" -> 1L)), 10,
      localThreshold = 0)
    assert(merges === Seq(("a", "b"))) // then single symbols: no pairs
  }

  test("train: local fast path == distributed loop") {
    val merges = BpeTrain.train(spark, wordsDf(paperWords), 4)
    assert(merges ===
      BpeTrain.train(spark, wordsDf(paperWords), 4, localThreshold = 0))
  }

  test("applyMerge: greedy left-to-right, non-overlapping") {
    assert(BpeTrain.applyMerge(Seq("a", "a", "a"), "a", "a") ===
      Seq("aa", "a"))
    assert(BpeTrain.applyMerge(Seq("a", "a", "a", "a"), "a", "a") ===
      Seq("aa", "aa"))
    assert(BpeTrain.applyMerge(Seq("x", "a", "b", "y"), "a", "b") ===
      Seq("x", "ab", "y"))
  }

  test("encode: applies merges in training order") {
    val merges = BpeTrain.train(spark, wordsDf(paperWords), 10)
    val pieces = BpeTrain.encode(spark, wordsDf(Map("lowest" -> 1L)), merges)
      .collect().head.getSeq[String](1)
    // 'lowest' was never seen whole, but its subwords were: the learned
    // merges must decompose it into learned units, covering the word
    assert(pieces.mkString === "lowest")
    assert(pieces.length < 6) // some merges applied
  }

  test("wordFreqs: corpus-scale count is the only corpus-sized job") {
    val docs = Seq((1L, "low low NEWEST"), (2L, "  widest low ")).toDF(
      "doc_id", "text")
    val m = BpeTrain.wordFreqs(docs, "text").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m === Map("low" -> 3L, "newest" -> 1L, "widest" -> 1L))
  }

  test("encodeCorpus: per-doc piece stream == local fold in token order") {
    val docs = Seq(
      (1L, "low lower Lowest"),
      (2L, "  newest low  low "),
      (3L, "widest")).toDF("doc_id", "text")
    val merges = BpeTrain.train(spark,
      BpeTrain.wordFreqs(docs, "text"), 6)
    val got = BpeTrain.encodeCorpus(spark, docs, "doc_id", "text", merges)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toList).toMap
    def enc(w: String) = merges.foldLeft(BpeTrain.toSymbols(w)) {
      case (s, (a, b)) => BpeTrain.applyMerge(s, a, b)
    }.toList
    assert(got(1L) === enc("low") ++ enc("lower") ++ enc("lowest"))
    assert(got(2L) === enc("newest") ++ enc("low") ++ enc("low"))
    assert(got(3L) === enc("widest"))
    // reassembled stream spells the normalized doc back out
    assert(got(1L).mkString === "lowlowerlowest")
  }
}
