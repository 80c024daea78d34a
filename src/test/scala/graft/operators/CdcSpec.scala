package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class CdcSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables(spark, "/root/testdata/sf0.001", "documents")

  private def chunksOf(texts: Seq[String]) =
    Cdc.chunkTable(texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text"), "doc_id", "text")
      .select("doc_id", "idx", "start", "len", "hash")
      .as[(Long, Int, Int, Int, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap

  test("chunks tile the text exactly, within size bounds") {
    val texts = docs.select("text").as[String].collect().take(50)
    val byDoc = chunksOf(texts)
    texts.zipWithIndex.foreach { case (t, i) =>
      val bytes = t.getBytes("UTF-8")
      val cs = byDoc(i.toLong)
      // contiguous cover: starts chain, lens sum to byte length
      assert(cs.head._3 === 0)
      cs.sliding(2).foreach {
        case Array(a, b) => assert(b._3 === a._3 + a._4)
        case _ =>
      }
      assert(cs.map(_._4).sum === bytes.length)
      // all but the final chunk respect [min, max]; final respects max
      cs.init.foreach { c => assert(c._4 >= 24 && c._4 <= 128, c) }
      assert(cs.last._4 <= 128)
    }
  }

  test("boundaries are content-defined: appending text never changes earlier chunks") {
    val base = docs.select("text").as[String].collect().take(20)
    val byDoc = chunksOf(base)
    val extended = chunksOf(base.map(_ + " tail tail tail tail tail tail"))
    base.indices.foreach { i =>
      val orig = byDoc(i.toLong)
      val ext = extended(i.toLong)
      // every chunk of the original except the last survives the append
      orig.init.zip(ext).foreach { case (a, b) =>
        assert((a._3, a._4, a._5) === ((b._3, b._4, b._5)),
          s"doc $i: pre-append chunk changed")
      }
    }
  }

  test("shared content between documents yields shared chunk hashes") {
    val shared = ("the quick brown fox jumps over the lazy dog and " * 6).trim
    val a = "doc A starts differently then " + shared + " then ends one way"
    val b = "B has another intro entirely, " + shared + " and a different tail"
    val byDoc = chunksOf(Seq(a, b))
    val common = byDoc(0L).map(_._5).toSet intersect byDoc(1L).map(_._5).toSet
    assert(common.nonEmpty,
      "no shared chunks despite a shared 280-byte run — boundaries failed to re-sync")
    // and the dedup accounting sees them
    val stats = Cdc.dedupStats(Cdc.chunkTable(
      Seq((1L, a), (2L, b)).toDF("doc_id", "text"), "doc_id", "text"))
      .select("n_chunks", "distinct_chunks", "dup_chunks", "bytes_total",
        "bytes_dedup")
      .as[(Long, Long, Long, Long, Long)].head()
    assert(stats._3 > 0 && stats._3 === stats._1 - stats._2)
    assert(stats._5 < stats._4)
  }

  test("deterministic across runs; empty and null texts are safe") {
    val once = Cdc.chunkTable(docs, "doc_id", "text").collect().toSet
    val again = Cdc.chunkTable(docs, "doc_id", "text").collect().toSet
    assert(once === again)
    val edge = Cdc.chunkTable(
      Seq((1L, ""), (2L, null.asInstanceOf[String]), (3L, "short"))
        .toDF("doc_id", "text"), "doc_id", "text")
      .select("doc_id", "len").as[(Long, Int)].collect()
    // empty -> no chunks, null -> no chunks (posexplode drops null), short -> one sub-min chunk
    assert(edge.toSeq === Seq((3L, 5)))
  }
}
