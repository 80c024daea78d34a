package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CalibrationSpec extends SparkSpec {
  import spark.implicits._

  test("per-bin pred/obs/gap and ECE are exact ppm floor-divisions") {
    // bin 0 ([0, .1)): preds .02/.04, one positive of two -> obs 500000
    // bin 9 ([.9, 1]): preds .95/.95/1.0, all positive -> obs 1000000
    val df = Seq((false, 0.02), (true, 0.04),
      (true, 0.95), (true, 0.95), (true, 1.0)).toDF("y", "p")
    val rows = Calibration.report(df, col("y"), col("p")).collect()
    assert(rows.map(_.getLong(0)).toSeq === Seq(0L, 9L))
    val b0 = rows(0); val b9 = rows(1)
    assert((b0.getLong(1), b0.getLong(2)) === ((2L, 1L)))
    assert(b0.getLong(3) === (20000L + 40000L) / 2) // pred 30000
    assert(b0.getLong(4) === 500000L)
    assert(b0.getLong(5) === 470000L)
    assert((b9.getLong(1), b9.getLong(2)) === ((3L, 3L)))
    assert(b9.getLong(3) === (950000L * 2 + 1000000L) / 3) // 966666
    assert(b9.getLong(4) === 1000000L && b9.getLong(5) === 33334L)
    // ECE = (2*470000 + 3*33334) div 5 = 208000 (population-weighted)
    assert(rows.map(_.getLong(6)).distinct.toSeq ===
      Seq((2L * 470000L + 3L * 33334L) / 5L))
  }

  test("out-of-range scores clamp to edge bins; p = 1.0 stays in-bin") {
    val df = Seq((true, -0.5), (false, 1.7), (true, 1.0)).toDF("y", "p")
    val rows = Calibration.report(df, col("y"), col("p")).collect()
    assert(rows.map(_.getLong(0)).toSeq === Seq(0L, 9L))
    assert(rows(0).getLong(3) === 0L)        // clamped pred 0
    assert(rows(1).getLong(1) === 2L)        // 1.7 and 1.0 share bin 9
    assert(rows(1).getLong(3) === 1000000L)  // clamped pred 1e6
  }

  test("NULL label/score rows are excluded; perfect calibration ECE 0") {
    val perfect = (1 to 100).map { i =>
      // p = i/100; label true for exactly round(p*bin-size) pattern:
      // simplest exact case — p 0.0 or 1.0 with matching labels
      if (i <= 50) (false, 0.0) else (true, 1.0)
    }.toDF("y", "p")
    val rows = Calibration.report(perfect, col("y"), col("p")).collect()
    assert(rows.map(_.getLong(6)).distinct.toSeq === Seq(0L))
    val withNulls = Seq((Some(true), Some(0.5)), (None, Some(0.2)),
      (Some(false), None)).toDF("y", "p")
    assert(Calibration.report(withNulls, col("y"), col("p"))
      .agg(sum("n")).head().getLong(0) === 1L)
  }
}
