package graft.operators

import graft.SparkSpec

/** C4-style corpus-frequency boilerplate strip: df counting, tile
  * removal, in-order reassembly, all-boilerplate survival. */
class BoilerplateSpec extends SparkSpec {
  import spark.implicits._

  // tile=2: "cookie banner" appears in 3 docs (df=3 → dropped at
  // dropDf=3); every other tile is unique (kept)
  private def corpus = Seq(
    (1L, "cookie banner real content one"),
    (2L, "cookie banner real content two"),
    (3L, "cookie banner"),
    (4L, "only unique words here now"))
    .toDF("doc_id", "text")

  test("template tiles are stripped, unique content survives in order") {
    val out = Boilerplate.strip(corpus, "doc_id", "text",
        tile = 2, dropDf = 3)
      .orderBy("doc_id").collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L, 4L))
    // doc 1: tiles ["cookie banner", "real content", "one"] → first dropped
    assert(out(0).getAs[String]("clean_text") === "real content one")
    assert(out(0).getAs[Long]("n_tiles") === 3L)
    assert(out(0).getAs[Long]("n_kept") === 2L)
    assert(out(1).getAs[String]("clean_text") === "real content two")
    // doc 3 is ALL boilerplate: survives as a row with empty text
    assert(out(2).getAs[Long]("n_kept") === 0L)
    assert(out(2).getAs[String]("clean_text") === "")
    // doc 4 untouched
    assert(out(3).getAs[String]("clean_text") === "only unique words here now")
    assert(out(3).getAs[Long]("n_kept") === out(3).getAs[Long]("n_tiles"))
  }

  test("dropDf below 2 is rejected (would drop every tile)") {
    val e = intercept[IllegalArgumentException] {
      Boilerplate.strip(corpus, "doc_id", "text", tile = 2, dropDf = 1)
    }
    assert(e.getMessage.contains("dropDf"))
  }

  test("reassembly preserves tile order across many tiles") {
    val doc = (0 until 30).map(i => s"w$i").mkString(" ")
    val df = Seq((1L, doc)).toDF("doc_id", "text")
    val out = Boilerplate.strip(df, "doc_id", "text", tile = 3, dropDf = 2)
      .collect()(0)
    assert(out.getAs[String]("clean_text") === doc)
    assert(out.getAs[Long]("n_tiles") === 10L)
  }

  test("NULL and empty text survive as (id, 0, 0, \"\"), no phantom tile") {
    // r7 review fix: split("", " ") is [""], which minted one ''-tile
    // per empty doc (n_tiles=1) — and enough empty docs made '' itself
    // boilerplate, corrupting the kept stats of every other empty doc
    val df = Seq((1L, Option("real words here")), (2L, None),
      (3L, Option(""))).toDF("doc_id", "text")
    val out = Boilerplate.strip(df, "doc_id", "text", tile = 2, dropDf = 2)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3)))
    assert(out.toSeq === Seq((1L, 2L, 2L, "real words here"),
      (2L, 0L, 0L, ""), (3L, 0L, 0L, "")))
  }
}
