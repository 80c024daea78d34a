package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Partitioned sink + S7 delete-month semantics
  * (reference `database_service.py:415-475`). */
class SalesSinkSpec extends SparkSpec {
  import spark.implicits._

  private def sampleSales = Seq(
    ("Latte", 1, "2025-10", 1),
    ("Mocha", 2, "2025-11", 1),
    ("Scone", 3, "2025-11", 2),
    ("Drip", 4, "2025-12", 2))
    .toDF("item_name", "qty", "month", "location_id")

  test("layout: location dirs (LIST parity) x month dirs (pruning)") {
    val dir = Files.createTempDirectory("sales_sink").toString
    SalesSink.writePartitioned(sampleSales, dir, SaveMode.Overwrite)
    val locs = new java.io.File(dir).listFiles().map(_.getName)
      .filter(_.startsWith("location_id=")).sorted
    assert(locs.toSeq === Seq("location_id=1", "location_id=2"))
    val months = new java.io.File(s"$dir/location_id=1").listFiles()
      .map(_.getName).filter(_.startsWith("month=")).sorted
    assert(months.toSeq === Seq("month=2025-10", "month=2025-11"))
    // partition pruning reaches both levels
    val pruned = spark.read.parquet(dir)
      .filter($"location_id" === 1 && $"month" === "2025-11")
    assert(pruned.count() === 1)
  }

  test("overwriteMonth deletes one (location, month) slice, leaves the rest") {
    val dir = Files.createTempDirectory("sales_del").toString
    SalesSink.writePartitioned(sampleSales, dir, SaveMode.Overwrite)
    SalesSink.overwriteMonth(spark, dir, locationId = 1, month = "2025-11")
    val left = spark.read.parquet(dir)
      .select("item_name").as[String].collect().toSet
    // Mocha (loc 1, 2025-11) gone; Scone (loc 2, 2025-11) untouched
    assert(left === Set("Latte", "Scone", "Drip"))
  }

  test("overwriteMonth on a location's only month empties it for real " +
    "(regression: dynamic-overwrite silently no-ops on empty survivors)") {
    val dir = Files.createTempDirectory("sales_only").toString
    val one = Seq(("Solo", 1, "2025-11", 7), ("Other", 1, "2025-11", 8))
      .toDF("item_name", "qty", "month", "location_id")
    SalesSink.writePartitioned(one, dir, SaveMode.Overwrite)
    SalesSink.overwriteMonth(spark, dir, 7, "2025-11")
    val left = spark.read.parquet(dir)
      .select("item_name").as[String].collect().toSet
    assert(left === Set("Other"))
  }

  test("overwriteMonth with replacement backfills the slice") {
    val dir = Files.createTempDirectory("sales_bf").toString
    SalesSink.writePartitioned(sampleSales, dir, SaveMode.Overwrite)
    val repl = Seq(("Cortado", 9, "2025-11", 1))
      .toDF("item_name", "qty", "month", "location_id")
    SalesSink.overwriteMonth(spark, dir, 1, "2025-11", Some(repl))
    val loc1 = spark.read.parquet(dir).filter($"location_id" === 1)
      .select("item_name").as[String].collect().toSet
    assert(loc1 === Set("Latte", "Cortado"))
  }
}
