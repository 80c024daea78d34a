package graft

/** Every registered gate query must execute and (where it's a data query
  * on the standard tables) return rows at the smallest scale factor —
  * catches query-level regressions without waiting for the driver gate. */
class SparkEntrySpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("every queries() entry runs at sf0.001") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try {
          fn(spark, dir).count()
          None
        } catch {
          case e: Throwable => Some(s"$name: ${e.getMessage.take(120)}")
        }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("oracleSql keys are a subset of queries keys; entry returns rows") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle entries without queries: $orphans")
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every aux fixture referenced by a two-stage oracle is registered") {
    val referenced = SparkEntry.oracleSql.values
      .flatMap("""\{OUT\}/aux/([A-Za-z0-9_]+)""".r
        .findAllMatchIn(_).map(_.group(1)))
      .toSet
    val missing = referenced -- SparkEntry.auxOutputs.keySet
    assert(missing.isEmpty, s"oracle SQL reads unwritten aux fixtures: $missing")
  }
}
