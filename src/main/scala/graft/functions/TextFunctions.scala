package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.classic.{GraftColumnBridge => bridge}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-analysis primitives for large-scale training-data pipelines:
  * tokenization, language ID, quality scoring, fingerprinting, shingling.
  *
  * Everything here is built from codegen'd Spark built-ins (split,
  * higher-order array functions, regex) — no UDFs — so the functions stay
  * inside WholeStageCodegen and distribute trivially: each is a pure
  * per-row projection with no shuffle.
  *
  * Every function has an exactly-mirrorable DuckDB SQL form (see
  * `graft.queries.TextQueries`) so results are oracle-checkable.
  */
object TextFunctions {

  /** Whitespace tokens, empties filtered (so "" and "  " → []). */
  def tokens(text: Column): Column =
    filter(split(trim(text), "\\s+"), t => t =!= "")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword count: letter runs, single digits, and single
    * punctuation marks each count as one token — a cheap proxy for a
    * byte-pair-encoded length. */
  def subwordCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"), lit(0)))

  /** Expression-level "let": binds `v` once as a lambda variable so the
    * body references it instead of duplicating the whole subtree.
    * Catalyst copies expression trees at every reference site and does
    * not CSE inside lambdas — without this, an O(k) array used inside an
    * O(m) transform costs O(k·m) recomputation. */
  private[graft] def bind(v: Column)(body: Column => Column): Column =
    element_at(transform(array(v), body), 1)

  /** Word n-gram shingles over a (already materialized) token array. */
  def shinglesFromTokens(toks: Column, n: Int): Column = {
    val k = size(toks)
    when(k >= n,
      transform(sequence(lit(1), k - (n - 1)),
        i => array_join(slice(toks, i, lit(n)), " ")))
      .when(k > 0, array(array_join(toks, " ")))
      .otherwise(array().cast(ArrayType(StringType)))
  }

  /** Word n-gram shingles (joined with single spaces). Documents shorter
    * than n tokens produce one shingle = the whole token sequence; empty
    * documents produce none. Tokenization happens ONCE (bound lambda
    * var), not once per shingle. */
  def wordShingles(text: Column, n: Int): Column =
    bind(tokens(text))(toks => shinglesFromTokens(toks, n))

  /** Punctuation character ratio over total length (0 for empty text). */
  def punctRatio(text: Column): Column =
    when(length(text) > 0,
      length(regexp_replace(text, "[^\\p{Punct}]", "")).cast(DoubleType) /
        length(text))
      .otherwise(lit(0.0))

  private val enStopwords = Seq("the", "a", "an", "of", "and", "to", "in",
    "is", "that", "it", "for", "on", "with", "as", "was", "at", "by")

  /** The English stopword list shared by [[stopwordRatio]], the t02
    * oracle, and phrase-boundary operators (RAKE) — one definition so
    * the Spark side and every oracle's inline list cannot drift. */
  val enStopwordList: Seq[String] = enStopwords

  /** Fraction of tokens that are English stopwords (0 for empty docs). */
  def stopwordRatio(text: Column): Column = {
    val toks = tokens(text)
    when(size(toks) > 0,
      size(filter(toks, t => t.isin(enStopwords: _*))).cast(DoubleType) /
        size(toks))
      .otherwise(lit(0.0))
  }

  /** Gopher-style repetition signal: fraction of duplicate word n-grams,
    * 1 − distinct/total (0 for docs yielding no n-grams). High values
    * mark boilerplate/looping documents — the standard companion filter
    * to [[qualityScore]] in corpus curation. Shingles computed once
    * (bound lambda var); pure per-row projection. */
  def repetitionRatio(text: Column, n: Int = 2): Column =
    bind(wordShingles(text, n)) { sh =>
      when(size(sh) > 0,
        lit(1.0) - size(array_distinct(sh)).cast(DoubleType) / size(sh))
        .otherwise(lit(0.0))
    }

  /** Composite document quality score in [0,1]: length component (target
    * >= 100 tokens), low-punctuation component, natural-language
    * (stopword-bearing) component. Deterministic double arithmetic. */
  def qualityScore(text: Column): Column =
    least(lit(1.0), tokenCount(text).cast(DoubleType) / 100) * 0.4 +
      (lit(1.0) - least(lit(1.0), punctRatio(text) * 10)) * 0.3 +
      least(lit(1.0), stopwordRatio(text) * 4) * 0.3

  /** Per-language weighted profile for [[langId]]: `strong` markers are
    * function words distinctive of the language (weight 3), `weak`
    * markers are common but more shared function words (weight 1),
    * `accents` are language-characteristic diacritics/punctuation
    * (weight 5 per occurrence — the highest-precision signal). Published
    * stopword-profile langid shape (Cavnar & Trenkle-style evidence
    * weighting over closed-class words). Exposed so the t03/t30 oracle
    * SQL is generated from the same data and cannot drift. */
  final case class LangProfile(code: String, strong: Seq[String],
      weak: Seq[String], accents: String)

  val langProfiles: Seq[LangProfile] = Seq(
    LangProfile("en",
      Seq("the", "and", "that", "this", "with", "from", "have", "not"),
      Seq("a", "of", "to", "in", "is", "it", "for", "on", "was", "by"),
      ""),
    LangProfile("es",
      Seq("el", "los", "las", "que", "y", "es", "pero", "porque", "como"),
      Seq("la", "de", "en", "se", "un", "una", "con", "por", "no"),
      "áíóúñ¿¡"), // áíóúñ¿¡
    LangProfile("de",
      Seq("der", "die", "das", "und", "ist", "nicht", "ein", "eine",
        "mit", "von", "sind"),
      Seq("zu", "im", "den", "dem", "auch", "auf"),
      "äöüß"), // äöüß
    LangProfile("fr",
      Seq("le", "les", "des", "et", "est", "une", "dans", "pour", "pas",
        "sont", "avec", "ne"),
      Seq("du", "au", "il", "elle", "ce", "je"),
      "àâçèêëîïôùû")) // àâçèêëîïôùû

  /** Language ID: CJK characters → zh; otherwise argmax of per-language
    * weighted scores (3·strong-marker hits + weak-marker hits +
    * 5·accented-char occurrences per [[langProfiles]]), priority
    * en > es > de > fr on ties; all-zero scores → "unknown". Tokenizes
    * ONCE (bound lambda var); one codegen'd projection per row. */
  def langId(text: Column): Column =
    bind(tokens(lower(text))) { tk =>
      def score(p: LangProfile): Column = {
        val words = size(filter(tk, t => t.isin(p.strong: _*))) * 3 +
          size(filter(tk, t => t.isin(p.weak: _*)))
        if (p.accents.isEmpty) words
        else words +
          length(regexp_replace(lower(text), s"[^${p.accents}]", "")) * 5
      }
      val Seq(en, es, de, fr) = langProfiles.map(score)
      when(length(regexp_replace(text, "[^\\x{4e00}-\\x{9fff}]", "")) > 0, "zh")
        .when(en <= 0 && es <= 0 && de <= 0 && fr <= 0, "unknown")
        .when(en >= es && en >= de && en >= fr, "en")
        .when(es >= de && es >= fr, "es")
        .when(de >= fr, "de")
        .otherwise("fr")
    }

  /** Canonical document fingerprint: lowercase, collapse whitespace,
    * trim, md5. Two documents with the same fingerprint are exact
    * duplicates modulo case/whitespace. */
  def fingerprint(text: Column): Column =
    md5(trim(regexp_replace(lower(text), "\\s+", " ")))

  /** Regex PII scrub — emails, IPv4 addresses, and NANP-style phone
    * numbers replaced with typed placeholder tokens, the standard
    * pre-training redaction pass. Three chained codegen'd
    * regexp_replace calls (order matters: emails first — their
    * local/domain parts contain digit runs and dots that the later
    * patterns could clip). The patterns use only character classes,
    * bounded repetition, and word boundaries, so the identical regex
    * runs on Java's engine here and RE2 in the DuckDB oracle.
    * Heuristic by design (as in public curation pipelines): favors
    * recall on well-formed identifiers over exotic formats. */
  def redactPii(text: Column): Column = {
    val email = regexp_replace(text,
      "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>")
    val ip = regexp_replace(email,
      "\\b\\d{1,3}(\\.\\d{1,3}){3}\\b", "<IP>")
    regexp_replace(ip,
      "\\b\\d{3}[-. ]\\d{3}[-. ]\\d{4}\\b", "<PHONE>")
  }

  /** Content-defined chunk table (see [[graft.plans.CdcChunks]]) over
    * the RAW text — byte-level dedup must not normalize, or restored
    * chunks wouldn't reproduce the original. */
  def cdcChunks(text: Column, minSize: Int = 24, maskBits: Int = 5,
      maxSize: Int = 128): Column =
    bridge.column(graft.plans.CdcChunks(
      bridge.expression(text), minSize, maskBits, maxSize))

  /** Winnowing rolling-hash sketch (character-level; see
    * [[graft.plans.WinnowFingerprint]]) over the case/whitespace
    *-normalized text. */
  def winnowFingerprint(text: Column, k: Int = 5, w: Int = 4): Column =
    bridge.column(graft.plans.WinnowFingerprint(
      bridge.expression(trim(regexp_replace(lower(text), "\\s+", " "))), k, w))

  /** 64-bit SimHash over whitespace tokens: each token votes its xxhash64
    * bits; the sign of each bit's vote total forms the signature. Pure
    * higher-order-function fold — no UDF, no shuffle. */
  /** Native expression (one tight loop per row); [[simHash64Hof]] is the
    * pure-built-ins equivalent, bit-identical (spec-enforced). */
  def simHash64(text: Column): Column =
    bridge.column(graft.plans.SimHash64(bridge.expression(tokens(text))))

  def simHash64Hof(text: Column): Column = {
    // bits of h as a 64-element array, LSB first (static shifts on a
    // BOUND hash value — not 64 copies of the xxhash64 subtree)
    def bitsOf(h: Column): Column =
      array((0 until 64).map(i => shiftright(h, i).bitwiseAND(1L)): _*)
    val powers = array((0 until 64).map(i => lit(1L << i)): _*)
    val votes = aggregate(
      tokens(text),
      array_repeat(lit(0L), 64),
      (acc, t) => bind(xxhash64(t))(h =>
        zip_with(acc, bitsOf(h), (a, bit) => a + bit * 2L - 1L)))
    aggregate(
      zip_with(votes, powers, (v, p) => when(v > 0, p).otherwise(0L)),
      lit(0L), (acc, b) => acc.bitwiseOR(b))
  }

  /** Readability statistics (Flesch 1948 reading-ease inputs): sentence
    * count = runs of terminal punctuation (min 1), syllable count per
    * word = vowel-group runs (min 1) — the standard cheap heuristic.
    * Returns struct(n_words, n_sentences, n_syllables); the score
    * formula lives at the call site so the double chain stays a single
    * fixed shape mirrored in the oracle. All three are integer anchors. */
  def readabilityStats(text: Column): Column = {
    val words = tokens(text)
    struct(
      size(words).cast("long").as("n_words"),
      greatest(regexp_count(text, lit("[.!?]+")), lit(1))
        .cast("long").as("n_sentences"),
      aggregate(words, lit(0L),
        (acc, w) => acc +
          greatest(regexp_count(lower(w), lit("[aeiouy]+")), lit(1)))
        .as("n_syllables"))
  }

  /** Per-document Shannon character entropy + code-point counts in one
    * scan-side pass — struct(n_chars, n_distinct, entropy). See
    * [[graft.plans.CharEntropyStats]] for the exactness contract with
    * the relational DuckDB oracle (t24). */
  def charEntropyStats(text: Column): Column =
    bridge.column(graft.plans.CharEntropyStats(bridge.expression(text)))

  /** MinHash signature: for each of `numHashes` seeded hash functions,
    * the minimum hash over the document's distinct n-gram shingles.
    * Native expression; [[minHashSignatureHof]] is the pure-built-ins
    * equivalent, bit-identical (spec-enforced). Empty documents get
    * Long.MaxValue sentinels. */
  def minHashSignature(text: Column, n: Int, numHashes: Int): Column =
    bridge.column(graft.plans.MinHashSignature(
      bridge.expression(array_distinct(wordShingles(text, n))), numHashes))

  /** MinHash signature over an already-hashed element set (array<long>):
    * the banding-compatible sketch of ANY long-valued fingerprint set
    * (e.g. winnowing fingerprints). Same seeded family as
    * [[minHashSignature]]'s second phase. */
  def minHashSignatureOfHashes(hashes: Column, numHashes: Int): Column =
    bridge.column(graft.plans.MinHashSignatureOfHashes(
      bridge.expression(hashes), numHashes))

  def minHashSignatureHof(text: Column, n: Int, numHashes: Int): Column =
    bind(transform(array_distinct(wordShingles(text, n)), s => xxhash64(s))) {
      hs =>
        transform(sequence(lit(1), lit(numHashes)),
          seed => coalesce(
            array_min(transform(hs, h => xxhash64(seed, h))),
            lit(Long.MaxValue)))
    }

  // Gopher's "no fewer than 2 of these" stopword list (Rae et al. 2021
  // §A1.1) — NOT the ratio list above: the rule counts occurrences of
  // exactly these eight
  private val gopherStopwords =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Gopher-style document quality rules (Rae et al. 2021 §A1.1),
    * evaluated in EXACT integer arithmetic — every threshold is a
    * cross-multiplied integer comparison (mean word length in [3,10] is
    * `3n ≤ Σlen ≤ 10n`, the 80% alpha-word floor is `5·alpha ≥ 4n`, the
    * 15% duplicate-bigram ceiling is `20·dup ≤ 3·total`), so the flags
    * are bit-deterministic and replay exactly in any engine. The
    * symbol-ratio rule (`#`/`…` per word) is omitted: this corpus has no
    * symbol characters, so it would be a constant-true column.
    *
    * Returns a struct of the counters and per-rule booleans plus the
    * composite `keep`; one codegen'd projection per row, no shuffle, no
    * UDF. */
  def gopherStats(text: Column): Column = bind(tokens(text)) { tk =>
    val n = size(tk).cast(LongType)
    val sumChars = aggregate(tk, lit(0L), (acc, t) => acc + length(t))
    val nAlpha = size(filter(tk, t => t.rlike("[A-Za-z]"))).cast(LongType)
    val nStop =
      size(filter(tk, t => lower(t).isin(gopherStopwords: _*))).cast(LongType)
    bind(shinglesFromTokens(tk, 2)) { bg =>
      val nBg = size(bg).cast(LongType)
      val nDup = (size(bg) - size(array_distinct(bg))).cast(LongType)
      val okWords = n >= 50L && n <= 100000L
      val okLen = sumChars >= n * 3L && sumChars <= n * 10L
      val okAlpha = nAlpha * 5L >= n * 4L
      val okStop = nStop >= 2L
      val okRep = nDup * 20L <= nBg * 3L
      struct(
        n.as("n_words"), sumChars.as("sum_chars"), nAlpha.as("n_alpha"),
        nStop.as("n_stop"), nBg.as("n_bigrams"), nDup.as("n_dup_bigrams"),
        okWords.as("ok_wordcount"), okLen.as("ok_wordlen"),
        okAlpha.as("ok_alpha"), okStop.as("ok_stop"),
        okRep.as("ok_repetition"),
        (okWords && okLen && okAlpha && okStop && okRep).as("keep"))
    }
  }
}
