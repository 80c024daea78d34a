package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class PackingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables(spark, "/root/testdata/sf0.001", "documents")

  test("bins fill to the budget: every non-final bin crosses it with its " +
    "last doc, and assignment matches a sequential reference") {
    val budget = 1500
    val packed = Packing.packByBudget(docs, "doc_id", "n_chars",
      budget, shards = 4)
      .select($"shard", $"bin", $"doc_id", $"n_chars".cast("long"))
      .as[(Int, Long, Long, Long)].collect()

    // driver-side sequential reference per shard
    packed.groupBy(_._1).foreach { case (_, rows) =>
      var cum = 0L
      rows.sortBy(_._3).foreach { case (_, bin, _, tokens) =>
        assert(bin === cum / budget, s"bin mismatch at cum=$cum")
        cum += tokens
      }
    }
    // packing quality: a bin starts within `maxDoc` past its budget
    // boundary (the previous bin's overflow doc eats into it) and ends
    // within `maxDoc` past the next — so every non-final bin's tokens
    // land in (budget - maxDoc, budget + maxDoc)
    val maxDoc = docs.agg(max($"n_chars")).collect().head.getLong(0)
    val stats = Packing.binStats(
      Packing.packByBudget(docs, "doc_id", "n_chars", budget, 4), "n_chars")
      .select($"shard", $"bin", $"tokens".cast("long"))
      .as[(Int, Long, Long)].collect()
    stats.groupBy(_._1).foreach { case (_, bins) =>
      val lastBin = bins.map(_._2).max
      bins.filter(_._2 < lastBin).foreach { case (sh, b, tokens) =>
        assert(tokens > budget - maxDoc && tokens < budget + maxDoc,
          s"shard $sh bin $b out of fill bounds: $tokens")
      }
    }
  }

  test("assignment is deterministic under physical re-layout") {
    def run = Packing.packByBudget(docs.repartition(7), "doc_id", "n_chars",
      2000, shards = 8)
      .select("doc_id", "shard", "bin")
      .as[(Long, Int, Long)].collect().sortBy(_._1).toSeq
    assert(run === run)
  }
}
