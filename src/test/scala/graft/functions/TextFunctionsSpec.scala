package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.{TextFunctions => T}

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def one[A](c: org.apache.spark.sql.Column, text: String): A =
    Seq(text).toDF("t").select(c.as("r")).collect().head.getAs[A]("r")

  test("tokens: empty, whitespace-only, multi-space") {
    assert(one[Int](T.tokenCount(col("t")), "") === 0)
    assert(one[Int](T.tokenCount(col("t")), "   ") === 0)
    assert(one[Int](T.tokenCount(col("t")), "a  b\tc\nd") === 4)
  }

  test("subword count: letter runs + digits + punctuation") {
    // "don't" -> don, ', t ; "2x4!" -> 2, x, 4, !
    assert(one[Int](T.subwordCount(col("t")), "don't stop") === 4)
    assert(one[Int](T.subwordCount(col("t")), "2x4!") === 4)
  }

  test("word shingles: n=3") {
    type CSeq = scala.collection.Seq[String]
    val sh = one[CSeq](T.wordShingles(col("t"), 3), "a b c d e")
    assert(sh === Seq("a b c", "b c d", "c d e"))
    assert(one[CSeq](T.wordShingles(col("t"), 3), "a b") === Seq("a b"))
    assert(one[CSeq](T.wordShingles(col("t"), 3), "") === Seq())
  }

  test("langId: marker-based heuristic on real sentences") {
    assert(one[String](T.langId(col("t")),
      "the cat sat on the mat and it is happy") === "en")
    assert(one[String](T.langId(col("t")),
      "el perro corre en la calle y se esconde") === "es")
    assert(one[String](T.langId(col("t")),
      "der hund ist nicht mit der katze") === "de")
    assert(one[String](T.langId(col("t")),
      "le chien est dans les rues pour une heure") === "fr")
    assert(one[String](T.langId(col("t")), "机器学习很有趣") === "zh")
    assert(one[String](T.langId(col("t")), "xyzzy plugh") === "unknown")
  }

  test("langId: per-language precision >= 0.8 under same-script noise") {
    // Each labeled sentence carries its language's closed-class words
    // plus 12 English-vocab noise tokens (the synthetic corpus shape
    // t30 evaluates on). The weighted profiles must out-vote the noise.
    val noise = "table window key batch slow column big order join fast the customer"
    val corpus = Seq(
      "en" -> "the cat and the dog that is in this house with the king",
      "en" -> "this is not the end of the story that we have from him",
      "es" -> "el perro y el gato no están en la casa de los niños porque se fueron",
      "es" -> "los libros que me gusta leer porque son como un viaje",
      "de" -> "der hund und die katze sind nicht in dem haus mit einem großen garten",
      "de" -> "das ist ein kleines auto von der straße und die tür ist auf",
      "fr" -> "le chien et les chats ne sont pas dans la maison avec une grande porte",
      "fr" -> "les amis sont dans le jardin pour une fête avec des fleurs",
      "zh" -> "猫和狗在房子里",
      "zh" -> "我喜欢学习新的东西")
      .map { case (lang, s) => (lang, s + " " + noise) }
    val got = corpus.toDF("lang_true", "t")
      .select(col("lang_true"), T.langId(col("t")).as("lang_pred"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    // precision per predicted language (and, with this fixture, recall)
    for (lang <- Seq("en", "es", "de", "fr", "zh")) {
      val predicted = got.filter(_._2 == lang)
      assert(predicted.nonEmpty, s"$lang never predicted")
      val correct = predicted.count(p => p._1 == p._2)
      assert(correct.toDouble / predicted.size >= 0.8,
        s"$lang precision ${correct.toDouble / predicted.size}: " +
          got.mkString(", "))
    }
    val acc = got.count(p => p._1 == p._2).toDouble / got.size
    assert(acc >= 0.8, s"accuracy $acc: ${got.mkString(", ")}")
  }

  test("fingerprint normalizes case and whitespace") {
    val a = one[String](T.fingerprint(col("t")), "Hello   World")
    val b = one[String](T.fingerprint(col("t")), "  hello world ")
    val c = one[String](T.fingerprint(col("t")), "hello worlds")
    assert(a === b)
    assert(a !== c)
  }

  test("quality score in [0,1]; clean prose beats punctuation soup") {
    val clean = one[Double](T.qualityScore(col("t")),
      ("the quick brown fox jumps over the lazy dog and keeps running " +
        "through the field of tall grass in the morning ") * 3)
    val soup = one[Double](T.qualityScore(col("t")), "!!! ### $$$ %%% ^^^")
    assert(clean > soup)
    assert(clean >= 0.0 && clean <= 1.0 && soup >= 0.0 && soup <= 1.0)
  }

  test("simHash: equal texts equal; near texts near; far texts far") {
    def h(t: String) = one[Long](T.simHash64(col("t")), t)
    val base = "spark makes distributed data processing fast and reliable for everyone"
    assert(h(base) === h(base))
    val near = java.lang.Long.bitCount(h(base) ^ h(base.replace("fast", "quick")))
    val far = java.lang.Long.bitCount(h(base) ^ h("completely unrelated words about gardening tulips soil"))
    assert(near < far)
  }

  test("minhash signature: length, determinism, containment sensitivity") {
    def sig(t: String) =
      one[scala.collection.Seq[Long]](T.minHashSignature(col("t"), 3, 32), t)
    val a = sig("one two three four five six seven eight nine ten")
    assert(a.length === 32)
    assert(a === sig("one two three four five six seven eight nine ten"))
    val b = sig("one two three four five six seven eight nine eleven")
    val agree = a.zip(b).count { case (x, y) => x == y }
    assert(agree > 8, s"similar docs should share many minhashes, got $agree/32")
  }

  test("gopherStats: integer-exact rule flags and counters") {
    import org.apache.spark.sql.Row
    def stats(text: String): Row =
      one[Row](T.gopherStats(col("t")), text)
    // 60 words, all alpha, stopwords the+and, mean length ~5 -> keep
    val good = (1 to 56).map(i => s"word$i").mkString("the cat and dog ", " ", "")
    val g = stats(good)
    assert(g.getAs[Long]("n_words") === 60L)
    assert(g.getAs[Boolean]("keep") === true)
    // short doc fails the word-count rule only at the word-count flag
    val short = stats("the of " + (1 to 10).map(i => s"w$i").mkString(" "))
    assert(short.getAs[Boolean]("ok_wordcount") === false)
    assert(short.getAs[Boolean]("ok_stop") === true) // the + of = 2
    assert(short.getAs[Boolean]("keep") === false)
    // repetitive doc: 'ab ab ab...' -> every bigram identical
    val rep = stats(Seq.fill(60)("ab").mkString(" "))
    assert(rep.getAs[Long]("n_dup_bigrams") === 58L)
    assert(rep.getAs[Boolean]("ok_repetition") === false)
    // numeric soup fails the alpha floor; mean word length 1 fails wordlen
    val nums = stats((1 to 60).map(_ % 10).mkString(" "))
    assert(nums.getAs[Boolean]("ok_alpha") === false)
    assert(nums.getAs[Boolean]("ok_wordlen") === false)
    // empty text: zero counters, keep=false (word count), no crash
    val e = stats("")
    assert(e.getAs[Long]("n_words") === 0L)
    assert(e.getAs[Long]("sum_chars") === 0L)
    assert(e.getAs[Boolean]("keep") === false)
  }

  test("repetitionRatio: duplicate-bigram fraction with degenerate guards") {
    // "a b a b" -> bigrams [a b, b a, a b]: 3 total, 2 distinct -> 1/3
    val r = one[Double](T.repetitionRatio(col("t")), "a b a b")
    assert(math.abs(r - 1.0 / 3) < 1e-12, s"got $r")
    // all-distinct bigrams and sub-n docs -> 0; empty -> 0
    assert(one[Double](T.repetitionRatio(col("t")), "a b c") === 0.0)
    assert(one[Double](T.repetitionRatio(col("t")), "solo") === 0.0)
    assert(one[Double](T.repetitionRatio(col("t")), "") === 0.0)
    // pure loop -> ratio approaches 1
    val loop = one[Double](T.repetitionRatio(col("t")),
      Seq.fill(50)("spam ham").mkString(" "))
    assert(loop > 0.95, s"loop doc scored $loop")
  }

  test("redactPii: emails, IPv4s, phones replaced; lookalikes kept") {
    def red(s: String) = one[String](T.redactPii(col("t")), s)
    assert(red("mail bob.smith+x@corp.example.org now") ===
      "mail <EMAIL> now")
    assert(red("host 192.168.001.1 up") === "host <IP> up")
    assert(red("call 555-123-4567 or 555 987 6543") ===
      "call <PHONE> or <PHONE>")
    assert(red("a@b.io 1.2.3.4 111-222-3333") === "<EMAIL> <IP> <PHONE>")
    // near-misses survive: bare domain, short number runs, version-ish
    // dotted pairs, decimals
    assert(red("see example.org v1.2 price 3.14 id 12-34") ===
      "see example.org v1.2 price 3.14 id 12-34")
    assert(red("") === "")
  }

  test("readabilityStats: vowel-group syllables, punctuation-run sentences, floors") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // "Hello world. It works!" -> 4 words, 2 sentences,
    // syllables: he-llo(2: e, o) wor(1: o) ld., it(1) works(1+? o) ->
    // hello=2 (e,o), world=1 (o), it=1 (i), works=1 (o) = 5
    val Seq((w, sen, syl)) = Seq("Hello world. It works!").toDF("text")
      .select(TextFunctions.readabilityStats(col("text")).as("r"))
      .select(col("r.n_words"), col("r.n_sentences"), col("r.n_syllables"))
      .as[(Long, Long, Long)].collect().toSeq
    assert((w, sen, syl) === ((4L, 2L, 5L)))
    // no terminal punctuation and a vowelless token both floor at 1
    val Seq((w2, sen2, syl2)) = Seq("tsk brr").toDF("text")
      .select(TextFunctions.readabilityStats(col("text")).as("r"))
      .select(col("r.n_words"), col("r.n_sentences"), col("r.n_syllables"))
      .as[(Long, Long, Long)].collect().toSeq
    assert((w2, sen2, syl2) === ((2L, 1L, 2L)))
  }
}
