package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SequentialIdsSpec extends SparkSpec {
  import spark.implicits._

  test("ids are dense 0..n-1 and equal the rank in the total order") {
    val df = (1 to 97).map(i => (i.toLong, s"k${i % 10}"))
      .toDF("id", "grp")
      .repartition(7) // scrambled physical layout in
    val got = SequentialIds.assign(df, Seq(col("grp"), col("id")))
      .collect().map(r => (r.getString(1), r.getLong(0), r.getLong(2)))
    assert(got.map(_._3).sorted.toSeq === (0L until 97L))
    // seq order == (grp, id) order
    val bySeq = got.sortBy(_._3).map(t => (t._1, t._2)).toSeq
    assert(bySeq === got.map(t => (t._1, t._2)).sortBy(identity).toSeq)
  }

  test("assignment is deterministic across invocations") {
    val df = (1 to 500).map(i => ((i * 7919) % 500).toLong).toDF("k")
      .repartition(13)
    def run() = SequentialIds.assign(df.distinct(), Seq(col("k")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(run() === run())
  }

  test("the numbering window is per-partition, never a one-task global") {
    val df = (1 to 50).map(_.toLong).toDF("k")
    val plan = SequentialIds.assign(df, Seq(col("k")))
      .queryExecution.executedPlan.toString
    val winLines = plan.linesIterator.filter(_.contains("row_number"))
      .mkString("\n")
    // the window spec partitions by _pid (an empty partition-by would
    // be the single-task global window this operator exists to avoid)
    assert(winLines.contains("_pid"), plan)
  }
}
