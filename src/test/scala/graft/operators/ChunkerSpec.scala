package graft.operators

import graft.SparkSpec

class ChunkerSpec extends SparkSpec {
  import spark.implicits._

  test("exact windows, overlap, and short final chunk") {
    // 7 words, window 3, stride 2 → starts 0,2,4,6
    val df = Seq((1L, "a b c d e f g")).toDF("doc_id", "text")
    val got = Chunker.chunk(df, "doc_id", "text", window = 3, stride = 2)
      .select("doc_id", "chunk_idx", "chunk_text", "n_words")
      .as[(Long, Int, String, Int)].collect().sortBy(_._2).toSeq
    assert(got === Seq(
      (1L, 0, "a b c", 3),
      (1L, 1, "c d e", 3),
      (1L, 2, "e f g", 3),
      (1L, 3, "g", 1)))
  }

  test("whitespace runs tokenize away; empty docs yield no chunks") {
    val df = Seq(
      (1L, "  x   y  "), (2L, ""), (3L, "   ")).toDF("doc_id", "text")
    val got = Chunker.chunk(df, "doc_id", "text", window = 5, stride = 5)
      .select("doc_id", "chunk_text", "n_words")
      .as[(Long, String, Int)].collect().toSeq
    assert(got === Seq((1L, "x y", 2)))
  }

  test("stride == window gives disjoint cover of every token") {
    val words = (1 to 23).map(i => s"w$i")
    val df = Seq((9L, words.mkString(" "))).toDF("doc_id", "text")
    val chunks = Chunker.chunk(df, "doc_id", "text", window = 5, stride = 5)
      .select("chunk_idx", "chunk_text").as[(Int, String)]
      .collect().sortBy(_._1).map(_._2)
    assert(chunks.flatMap(_.split(" ")).toSeq === words)
    assert(chunks.length === 5) // ceil(23/5)
  }

  test("chunking is map-only: no exchange in the plan") {
    val df = Seq((1L, "a b c")).toDF("doc_id", "text")
    val plan = Chunker.chunk(df, "doc_id", "text", 2, 1)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("invalid window/stride rejected") {
    val df = Seq((1L, "a")).toDF("doc_id", "text")
    intercept[IllegalArgumentException](Chunker.chunk(df, "doc_id", "text", 0, 1))
    intercept[IllegalArgumentException](Chunker.chunk(df, "doc_id", "text", 3, 4))
  }
}
