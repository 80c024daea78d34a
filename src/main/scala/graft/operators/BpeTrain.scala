package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding merge training (Sennrich et al. 2016, public
  * literature) — learn subword merge rules from a corpus, the tokenizer-
  * training half of an LLM data pipeline (the reference has no tokenizer;
  * north-star extension per SURVEY.md §7).
  *
  * Scale shape — the one decision that matters at 100 TB: train on the
  * DISTINCT-WORD table, not the corpus. The corpus-scale work is a single
  * word-frequency count (map-side combinable shuffle); every merge
  * iteration then runs on the vocab-sized frame (10^5–10^7 rows
  * regardless of corpus bytes, Heaps' law), so K merge rounds cost
  * K × vocab-scans, not K × corpus-scans. Pair counting is relational
  * (explode adjacent pairs, weighted sum, global top-1 = a 1-row
  * TakeOrdered); the merge application is a typed map over the
  * vocab-sized frame — explicitly NOT corpus-bounded, which is why a
  * per-row Scala function is acceptable here and only here.
  */
object BpeTrain {

  /** Corpus-scale step: whitespace word frequencies (one combinable
    * count shuffle over the corpus — the only corpus-sized job). */
  def wordFreqs(docs: DataFrame, text: String): DataFrame =
    docs.select(explode(split(trim(lower(col(text))), "\\s+")).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** Split a word into CODE-POINT symbols (not UTF-16 chars): a
    * per-char split would break supplementary-plane characters into
    * lone surrogates, which have no UTF-8 encoding — and the
    * distributed/local trainers would then disagree on symbol order. */
  private[operators] def toSymbols(w: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var i = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      out += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    out.result()
  }

  /** Unsigned UTF-8 byte comparison — Spark's UTF8String binary order.
    * trainLocal must tie-break with THIS order, not Scala's default
    * String ordering (UTF-16 code-unit order), or the two trainers pick
    * different merges when tied symbols span the BMP/astral boundary. */
  private[operators] def utf8Compare(s1: String, s2: String): Int = {
    val a = s1.getBytes("UTF-8")
    val b = s2.getBytes("UTF-8")
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n) {
      val d = (a(i) & 0xFF) - (b(i) & 0xFF)
      if (d != 0) return d
      i += 1
    }
    a.length - b.length
  }

  private[operators] val utf8Ordering: Ordering[String] =
    (x: String, y: String) => utf8Compare(x, y)

  /** Greedy left-to-right, non-overlapping single-merge application:
    * BPE's standard "apply rule (a,b) → a+b" scan. */
  private[operators] def applyMerge(syms: Seq[String], a: String,
      b: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += a + b; i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** In-memory reference trainer (used by the property spec as the
    * oracle; also the exact semantics the distributed path implements).
    * Tie-break: highest weighted count, then lexicographic (a, b). */
  private[operators] def trainLocal(words: Map[String, Long],
      numMerges: Int): Seq[(String, String)] = {
    var vocab: Seq[(Seq[String], Long)] =
      words.toSeq.map { case (w, f) => (toSymbols(w), f) }
    val merges = Seq.newBuilder[(String, String)]
    var k = 0
    var done = false
    while (k < numMerges && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (syms, f) =>
        syms.sliding(2).foreach {
          case Seq(a, b) => counts((a, b)) = counts.getOrElse((a, b), 0L) + f
          case _ =>
        }
      }
      if (counts.isEmpty) done = true
      else {
        // tie-break in UTF-8 byte order to match the distributed orderBy
        implicit val u: Ordering[String] = utf8Ordering
        val ((a, b), _) = counts.toSeq.min(
          Ordering.by { e: ((String, String), Long) =>
            (-e._2, e._1._1, e._1._2)
          })
        merges += ((a, b))
        vocab = vocab.map { case (syms, f) => (applyMerge(syms, a, b), f) }
        k += 1
      }
    }
    merges.result()
  }

  /** Distributed trainer: learns up to `numMerges` merge rules from a
    * (word, freq) table. Stops early when no adjacent pair remains.
    *
    * Size-adaptive local finish (the [[ConnectedComponents]] union-find
    * discipline): a vocab that fits one bounded collect trains
    * driver-side via [[trainLocal]] — IDENTICAL semantics (the
    * distributed==reference property spec pins both paths) with none of
    * the per-round job overhead (each distributed round is a top-1 job
    * plus a checkpoint job; at K rounds that's 2K jobs of fixed
    * scheduling cost regardless of data size). The bound is CHECKED,
    * not assumed — `limit(threshold+1).count()` never scans past the
    * cap, so a 100 TB corpus with a 10^7-word vocab takes the
    * distributed loop. Pass `localThreshold = 0` to force it. */
  def train(spark: SparkSession, words: DataFrame, numMerges: Int,
      localThreshold: Int = 1 << 16): Seq[(String, String)] = {
    import spark.implicits._
    // pre-aggregate duplicate word rows so both paths see summed freqs
    // (a collect().toMap would collapse duplicates last-wins while the
    // distributed loop sums them — same input, same semantics, checked)
    val wf = words.select(col("word"), col("freq").cast("long"))
      .groupBy("word").agg(sum("freq").as("freq"))
    if (localThreshold > 0 &&
        wf.limit(localThreshold + 1).count() <= localThreshold) {
      return trainLocal(wf.as[(String, Long)].collect().toMap, numMerges)
    }
    // vocab-sized working frame: (symbols, freq)
    var vocab = wf
      .as[(String, Long)]
      .map { case (w, f) => (toSymbols(w), f) }
      .toDF("syms", "freq")
      .localCheckpoint()
    val merges = Seq.newBuilder[(String, String)]
    var k = 0
    var done = false
    while (k < numMerges && !done) {
      // adjacent-pair weighted counts: explode zip(syms[0..n-2], syms[1..n-1]);
      // global argmax is a 1-row TakeOrdered, not a collect of the counts
      val len = greatest(size(col("syms")) - 1, lit(0))
      val top = vocab
        .select(col("freq"), explode(zip_with(
          slice(col("syms"), lit(1), len),
          slice(col("syms"), lit(2), len),
          (x, y) => struct(x.as("a"), y.as("b"))))
          .as("p"))
        .select(col("p.a").as("a"), col("p.b").as("b"), col("freq"))
        .groupBy("a", "b").agg(sum("freq").as("cnt"))
        .orderBy(col("cnt").desc, col("a"), col("b"))
        .limit(1)
        .collect()
      if (top.isEmpty) done = true
      else {
        val (a, b) = (top(0).getString(0), top(0).getString(1))
        merges += ((a, b))
        val next = vocab.as[(Seq[String], Long)]
          .map { case (syms, f) => (applyMerge(syms, a, b), f) }
          .toDF("syms", "freq")
          .localCheckpoint() // cut the K-deep lineage each round
        vocab.unpersist()
        vocab = next
        k += 1
      }
    }
    merges.result()
  }

  /** Encode words with learned merges (applied in training order) —
    * vocab-sized typed map; corpus encoding would join words → pieces. */
  def encode(spark: SparkSession, words: DataFrame,
      merges: Seq[(String, String)]): DataFrame = {
    import spark.implicits._
    words.select(col("word"), col("freq").cast("long")).as[(String, Long)]
      .map { case (w, f) =>
        val pieces = merges.foldLeft(toSymbols(w)) {
          case (syms, (a, b)) => applyMerge(syms, a, b)
        }
        (w, pieces, f)
      }
      .toDF("word", "pieces", "freq")
  }

  /** Corpus-level BPE encoding — the tokenizer-APPLICATION half: every
    * document becomes its subword-piece stream. Returns (doc, pieces).
    *
    * Scale shape: the iterative merge fold runs ONCE PER DISTINCT WORD
    * (the vocab-sized [[encode]] map, Heaps' law — millions of rows at
    * 100 TB, not trillions); the corpus-scale work is a positional
    * explode plus one equi-join of the token stream against the pieces
    * table (AQE broadcasts it when the vocab is small enough) and a
    * per-doc reassembly whose `collect_list` is bounded by ONE
    * document's length — the same per-doc bound every chunker/window
    * op here relies on. Tokenization matches [[wordFreqs]]
    * (trim/lower/whitespace) so every token hits the vocab. */
  def encodeCorpus(spark: SparkSession, docs: DataFrame, idCol: String,
      textCol: String, merges: Seq[(String, String)]): DataFrame = {
    val pieces = encode(spark, wordFreqs(docs, textCol), merges)
      .select("word", "pieces")
    val toks = docs.select(col(idCol).as("doc"),
      posexplode(split(trim(lower(col(textCol))), "\\s+"))
        .as(Seq("pos", "word")))
      .filter(col("word") =!= "")
    toks.join(pieces, "word")
      .groupBy("doc")
      .agg(flatten(transform(
        array_sort(collect_list(struct(col("pos"), col("pieces")))),
        s => s("pieces"))).as("pieces"))
  }
}
