package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic checks for round-11 wave 33: momentum ROC, Benford MAD. */
class Round11Wave33Spec extends AnyFunSuite with SparkFixture {

  test("win_momentum_roc: signals are consistent with the milli value") {
    val rows = SparkEntry.queries("win_momentum_roc")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (roc, sig) = (r.getLong(4), r.getString(5))
      val expected = if (roc > 80) "overbought" else if (roc < -80) "oversold" else "neutral"
      assert(sig == expected, s"signal consistency: $r")
      assert(r.getLong(3) > 0, "denominator guarded positive")
    }
  }

  test("agg_benford_mad: powers of two conform, uniform values do not") {
    val rows = SparkEntry.queries("agg_benford_mad")(spark, sf).collect()
    val byS = rows.map(r => r.getString(0) -> r).toMap
    val (p2, uni) = (byS("pow2"), byS("uniform"))
    assert(!uni.getBoolean(4), "uniform first digits are nowhere near Benford")
    assert(p2.getLong(3) < uni.getLong(3),
      s"2^k tracks Benford far better: ${p2.getLong(3)} vs ${uni.getLong(3)}")
    // uniform over [1000, 100000): digit mass ≈ flat-ish ⇒ MAD ≫ 15000
    assert(uni.getLong(3) > 30000L, s"uniform MAD: $uni")
    assert(uni.getLong(2) == 9 && p2.getLong(2) <= 9, "digit classes")
  }
}
