package graft.operators

import graft.SparkSpec

class DatasetCardSpec extends SparkSpec {
  import spark.implicits._

  test("per-lang rows + ALL rollup: counts, tokens, dup pressure") {
    val docs = Seq(
      ("en", "s1", 5L, Some("a b")),
      ("en", "s2", 5L, Some("a  B ")), // same fingerprint as "a b"
      ("en", "s1", 3L, Some("xyz")),
      ("de", "s1", 4L, Option.empty[String]), // NULL text -> sentinel
      ("de", "s1", 0L, Some(""))).toDF("lang", "source", "n_chars", "text")
    val got = DatasetCard.report(docs).collect()
      .map(r => r.getString(0) -> ((r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))).toMap
    assert(got("en") === ((3L, 2L, 13L, 5L, 2L, 1L)))
    assert(got("de") === ((2L, 1L, 4L, 0L, 2L, 0L)))
    assert(got("ALL") === ((5L, 2L, 17L, 5L, 4L, 1L)))
    assert(got.keySet === Set("en", "de", "ALL"))
  }

  test("NULL lang is its own row, distinct from the ALL rollup") {
    val docs = Seq((Option.empty[String], "s1", 1L, Some("x")),
      (Some("en"), "s1", 2L, Some("y")))
      .toDF("lang", "source", "n_chars", "text")
    val got = DatasetCard.report(docs).collect()
      .map(r => Option(r.getString(0)) -> r.getLong(2)).toMap
    assert(got === Map(None -> 1L, Some("en") -> 1L, Some("ALL") -> 2L))
  }

  test("is_total distinguishes the rollup from a genuine 'ALL' lang") {
    val docs = Seq(("ALL", "s1", 1L, Some("x")), ("en", "s1", 2L, Some("y")))
      .toDF("lang", "source", "n_chars", "text")
    val got = DatasetCard.report(docs).collect()
      .map(r => (r.getString(0), r.getBoolean(1)) -> r.getLong(2)).toMap
    // two lang='ALL' rows, structurally distinct via the grouping flag
    assert(got === Map(("ALL", false) -> 1L, ("en", false) -> 1L,
      ("ALL", true) -> 2L))
  }
}
