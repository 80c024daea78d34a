package graft.operators

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.Prop.propBoolean

import graft.SparkSpec

class BloomSeenSetSpec extends SparkSpec {
  import spark.implicits._

  private val M = 1L << 16
  private val K = 5

  test("no false negatives, ever (property)") {
    val keyGen = Gen.listOfN(40, Gen.alphaNumStr.suchThat(_.nonEmpty))
    val prop = Prop.forAll(keyGen, keyGen) { (seenKeys, batchKeys) =>
      (seenKeys.nonEmpty && batchKeys.nonEmpty) ==> {
        val seen = seenKeys.toDF("fp")
        val bits = BloomSeenSet.buildBits(seen, "fp", M, K)
        val marked = BloomSeenSet
          .markSeen(batchKeys.toDF("fp"), "fp", bits, M, K)
          .collect().map(r => r.getString(0) -> r.getBoolean(1))
        val seenSet = seenKeys.toSet
        marked.forall { case (k, hit) => !seenSet.contains(k) || hit }
      }
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }

  test("definite misses are filtered; tiny filter still never drops seen") {
    val seen = (1 to 50).map(i => s"doc$i").toDF("fp")
    // m=16: heavy saturation -> many false positives, zero false negatives
    val bits = BloomSeenSet.buildBits(seen, "fp", 16L, 3)
    val batch = ((1 to 50).map(i => s"doc$i") ++
      (1 to 50).map(i => s"new$i")).toDF("fp")
    val kept = BloomSeenSet.filterUnseen(batch, "fp", bits, 16L, 3)
      .as[String].collect().toSet
    assert(kept.forall(_.startsWith("new"))) // nothing seen survives
  }

  test("bits are deterministic and mergeBits == rebuild over the union") {
    val a = (1 to 30).map(i => s"a$i").toDF("fp")
    val b = (1 to 30).map(i => s"b$i").toDF("fp")
    val bitsA1 = BloomSeenSet.buildBits(a, "fp", M, K).as[Long].collect().sorted
    val bitsA2 = BloomSeenSet.buildBits(a, "fp", M, K).as[Long].collect().sorted
    assert(bitsA1.toSeq === bitsA2.toSeq)
    val merged = BloomSeenSet.mergeBits(
      BloomSeenSet.buildBits(a, "fp", M, K), b, "fp", M, K)
      .as[Long].collect().sorted
    val rebuilt = BloomSeenSet.buildBits(a.union(b), "fp", M, K)
      .as[Long].collect().sorted
    assert(merged.toSeq === rebuilt.toSeq)
  }

  test("large filter: no false positives on a disjoint batch, hits exact") {
    val seen = (1 to 200).map(i => s"doc$i").toDF("fp")
    val bits = BloomSeenSet.buildBits(seen, "fp", M, K)
    val marked = BloomSeenSet.markSeen(
      (150 to 250).map(i => s"doc$i").toDF("fp"), "fp", bits, M, K)
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    // 200 keys, 65536 bits: expected FP rate ~2e-8 — treat as exact
    assert((150 to 200).forall(i => marked(s"doc$i")))
    assert((201 to 250).forall(i => !marked(s"doc$i")))
  }

  test("plan: bits arrive via broadcast, batch never re-shuffled twice") {
    val seen = (1 to 50).map(i => s"doc$i").toDF("fp")
    val bits = BloomSeenSet.buildBits(seen, "fp", M, K)
    val p = BloomSeenSet.markSeen((1 to 9).map(i => s"x$i").toDF("fp"),
      "fp", bits, M, K)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("extended"))
    assert(p.contains("BroadcastExchange"), p)
  }
  test("broadcastBits=false (the 100 TB bits-table path) gives " +
    "identical verdicts through the shuffled anti-join") {
    val seen = Seq("a", "b", "c").toDF("fp")
    val bits = BloomSeenSet.buildBits(seen, "fp", M, K)
    val batch = Seq("a", "x", "c", "y").toDF("fp")
    def verdicts(bc: Boolean) =
      BloomSeenSet.markSeen(batch, "fp", bits, M, K, broadcastBits = bc)
        .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(verdicts(true) === verdicts(false))
    assert(verdicts(false)("a") && !verdicts(false)("x"))
  }

  test("null keys resolve like a real value, never silently 'seen'") {
    val seen = Seq(Some("a"), Some("b")).toDF("fp")
    val bits = BloomSeenSet.buildBits(seen, "fp", M, K)
    val batch = Seq(Some("a"), None, Some("z")).toDF("fp")
    val marked = BloomSeenSet.markSeen(batch, "fp", bits, M, K)
      .collect().map(r => Option(r.getString(0)) -> r.getBoolean(1)).toMap
    assert(marked(Some("a")))
    assert(!marked(None)) // null fp was never in the seen-set
    assert(!marked(Some("z")))
    // and a null key IN the seen-set bloom-hits null batch keys
    val bits2 = BloomSeenSet.buildBits(
      Seq(Option.empty[String]).toDF("fp"), "fp", M, K)
    val m2 = BloomSeenSet.markSeen(batch, "fp", bits2, M, K)
      .collect().map(r => Option(r.getString(0)) -> r.getBoolean(1)).toMap
    assert(m2(None))
  }
}
