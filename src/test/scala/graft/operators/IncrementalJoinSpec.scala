package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class IncrementalJoinSpec extends SparkSpec {
  import spark.implicits._

  private lazy val li = Tables(spark, "/root/testdata/sf0.001", "lineitem")
    .select("l_orderkey", "l_linenumber", "l_quantity")
  private lazy val or = Tables(spark, "/root/testdata/sf0.001", "orders")
    .select(col("o_orderkey").as("l_orderkey"), col("o_orderstatus"))

  private def rows(df: DataFrame) =
    df.select(col("l_orderkey"), col("l_linenumber"), col("o_orderstatus"))
      .as[(Long, Int, String)].collect()
      .groupBy(identity).view.mapValues(_.length).toMap

  test("stored result + delta terms == full recompute, multiset-identical") {
    val (ba, da) = (li.filter($"l_orderkey" % 3 =!= 0),
      li.filter($"l_orderkey" % 3 === 0))
    val (bb, db) = (or.filter($"l_orderkey" % 5 =!= 0),
      or.filter($"l_orderkey" % 5 === 0))
    val maintained = IncrementalJoin.maintained(
      ba.join(bb, Seq("l_orderkey")), ba, da, bb, db, Seq("l_orderkey"))
    assert(rows(maintained) === rows(li.join(or, Seq("l_orderkey"))))
  }

  test("empty deltas add nothing; delta⋈delta keys appear exactly once") {
    val empty = li.limit(0)
    val none = IncrementalJoin.deltaJoin(li, empty, or, or.limit(0),
      Seq("l_orderkey"))
    assert(none.count() === 0)
    // a key present ONLY in the deltas must come from the dA⋈dB term alone
    val onlyDelta = IncrementalJoin.maintained(
      li.limit(0).join(or.limit(0), Seq("l_orderkey")),
      li.limit(0), li, or.limit(0), or, Seq("l_orderkey"))
    assert(rows(onlyDelta) === rows(li.join(or, Seq("l_orderkey"))))
  }
}
