package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic checks for round-11 wave 22: tail dependence, Lin's CCC,
  * Theil's U2.
  */
class Round11Wave22Spec extends AnyFunSuite with SparkFixture {

  test("agg_tail_dependence: shared factor co-locates the extremes") {
    val r = SparkEntry.queries("agg_tail_dependence")(spark, sf).collect().head
    assert(r.getBoolean(7), "dependent λ must dominate the independent one 3×")
    // λ_dep ≈ P(noise > 50) ≈ 0.49 under the shared spike
    assert(r.getLong(5) > 350000L && r.getLong(5) < 650000L, s"dependent lambda: $r")
    assert(r.getLong(6) < 150000L, s"independent lambda: $r")
    assert(r.getLong(2) <= r.getLong(1) && r.getLong(4) <= r.getLong(3))
  }

  test("agg_lin_ccc: the location shift costs concordance") {
    val rows = SparkEntry.queries("agg_lin_ccc")(spark, sf).collect()
    val byPair = rows.map(r => r.getString(0) -> r).toMap
    val (al, sh) = (byPair("aligned"), byPair("shifted"))
    assert(al.getLong(2) == sh.getLong(2), "same covariance — shift changes nothing there")
    assert(al.getLong(3) > sh.getLong(3), "CCC must punish the +10 shift")
    // shared z (var 833) vs item noise (var 75): CCC_aligned ≈ 0.9+
    assert(al.getLong(3) > 850000L, s"aligned ccc: $al")
    assert(sh.getLong(3) < al.getLong(3) - 20000L, "penalty is material")
  }

  test("agg_theil_u2: the 2-bar smoother beats carry-forward everywhere") {
    val rows = SparkEntry.queries("agg_theil_u2")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(5), s"smoother must beat naive: $r")
      // analytic 1.5σ²/2σ² = 0.75; band for finite-sample drift
      assert(r.getLong(4) > 550000L && r.getLong(4) < 950000L, s"u2² band: $r")
    }
  }
}
