package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic checks for the round-10 wave-41 ops beyond the oracle gate. */
class Round10Wave41Spec extends AnyFunSuite with SparkFixture {

  test("agg_tukey_fences: quartiles ordered; uniform data throws nothing past the fences") {
    val rows = SparkEntry.queries("agg_tukey_fences")(spark, sf).collect()
    assert(rows.length >= 2)
    rows.foreach { r =>
      val (n, q1, q3) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(q1 <= q3, s"quartile order: $r")
      assert(r.getLong(6) == q3 - q1, "iqr column consistent")
      val outliers = r.getLong(4) + r.getLong(5)
      // near-uniform bodies keep fence-crossers rare even for skewed types
      assert(outliers * 20 <= n, s"fence-crossers stay a small minority: $r")
    }
  }

  test("llm_membership_inference: planted loss discount leaks and is flagged") {
    val r = SparkEntry.queries("llm_membership_inference")(spark, sf).collect().head
    val (n, nm, nn) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(nm + nn == n)
    assert(math.abs(nm - nn) * 5 < n, "md5 split near-even")
    val auc = r.getLong(4)
    // -300 milli on a U(0,1000) loss: attack AUC lands well above chance
    assert(auc > 600000 && auc < 900000, s"planted leak in the expected AUC band: $auc")
    assert(r.getBoolean(5), "the leakage flag must fire")
  }

  test("win_vwap: quotient bounded by window price extremes") {
    val rows = SparkEntry.queries("win_vwap")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (vol, pv, v, vwap) = (r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))
      assert(vol >= 1 && vol <= 7, s"synthetic volume in [1,7]: $r")
      assert(v >= 20 && v <= 140, "20 rows of [1,7] volume")
      assert(vwap == pv / v, "exact truncated quotient")
      assert(vwap >= 0 && vwap <= 60000, s"vwap in the cents range: $r")
    }
  }
}
