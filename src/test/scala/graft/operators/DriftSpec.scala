package graft.operators

import graft.SparkSpec

class DriftSpec extends SparkSpec {
  import spark.implicits._

  test("PSI matches the closed form; empty bins are smoothed terms") {
    // ref = [1,1,2], cur = [2,2,2], 2 bins over [1,2]:
    //   bin0: p=3/5, q=1/5 -> 0.4*ln(3); bin1: p=2/5, q=4/5 -> 0.4*ln(2)
    //   psi = 0.439445 + 0.277259 = 0.716704
    val ref = Seq(1L, 1L, 2L).toDF("v")
    val cur = Seq(2L, 2L, 2L).toDF("v")
    val rows = Drift.psiReport(ref, cur, "v", bins = 2, lo = 1L, hi = 2L)
      .collect()
    assert(rows.length === 2)
    val r0 = rows.head // biggest |contrib| first: bin 0
    assert(r0.getLong(0) === 0L)
    assert((r0.getLong(1), r0.getLong(2)) === ((2L, 0L)))
    assert(r0.getDouble(3) === 0.43944492)
    assert((r0.getLong(4), r0.getLong(5)) === ((3L, 3L)))
    assert(r0.getDouble(6) === 0.716704)
    assert(rows(1).getLong(0) === 1L &&
      rows(1).getDouble(3) === 0.27725887)
  }

  test("identical snapshots read PSI 0; k caps the report") {
    val d = (1L to 40L).toDF("v")
    val rows = Drift.psiReport(d, d, "v", bins = 8, lo = 1L, hi = 40L,
      k = 3).collect()
    assert(rows.length === 3)
    rows.foreach { r =>
      assert(r.getDouble(3) === 0.0 && r.getDouble(6) === 0.0)
    }
  }

  test("out-of-domain values clamp into edge bins, never vanish") {
    // cur drifts PAST the reference domain [1, 10] on both sides —
    // the strongest drift signal must land in bins 0 / bins-1 and
    // count toward n_cur, not fall off the spine
    val ref = (1L to 10L).toDF("v")
    val cur = (Seq.fill(20)(-500L) ++ Seq.fill(20)(999L)).toDF("v")
    val rows = Drift.psiReport(ref, cur, "v", bins = 5, lo = 1L, hi = 10L)
      .collect()
    val byBin = rows.map(r => r.getLong(0) -> r).toMap
    assert(rows.head.getLong(5) === 40L) // all out-of-range mass kept
    assert(byBin(0L).getLong(2) === 20L && byBin(4L).getLong(2) === 20L)
    assert(rows.head.getDouble(6) > 0.25)
  }

  test("one-sided mass lands in the right tail bin") {
    // cur gains a value in the top bin that ref never had
    val ref = (1L to 10L).toDF("v")
    val cur = ((1L to 10L) ++ Seq.fill(30)(100L)).toDF("v")
    val top = Drift.psiReport(ref, cur, "v", bins = 10, lo = 1L,
      hi = 100L).collect().head
    assert(top.getLong(0) === 9L) // ((100-1)*10) div 100 = 9
    assert(top.getLong(1) === 0L && top.getLong(2) === 30L)
    assert(top.getDouble(6) > 0.25) // "shifted" by the rule of thumb
  }
}
