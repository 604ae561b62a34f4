package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic checks for round-11 wave 25: SPC rules, chandelier exit,
  * refusal audit.
  */
class Round11Wave25Spec extends AnyFunSuite with SparkFixture {

  test("win_spc_rules: planted spikes trip rule 1, the drift segment trips rule 4") {
    val rows = SparkEntry.queries("win_spc_rules")(spark, sf).collect()
    assert(rows.nonEmpty)
    val r1 = rows.filter(_.getBoolean(3))
    val r4 = rows.filter(_.getBoolean(4))
    assert(r1.nonEmpty, "the +150 spikes must trip the 3σ rule")
    assert(r4.nonEmpty, "the 12-bar +40 drift must trip the 8-same-side rule")
    // rule 1 fires on a planted spike, or on a drift bar whose noise
    // stacks to the 3σ edge — never on plain ±20 noise around 500
    r1.foreach { r =>
      assert(r.getLong(1) % 97 == 0 || r.getLong(2) >= 530,
        s"rule1 fires only well off the centerline: $r")
    }
  }

  test("win_chandelier_exit: the stop trails below the high by ~3 ATRs") {
    val rows = SparkEntry.queries("win_chandelier_exit")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (cents, hh22, atr14, stop) = (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(stop == 14 * hh22 - 3 * atr14, "×14 identity")
      assert(hh22 >= cents, "the 22-bar high dominates the close")
      assert(r.getBoolean(6) == (14 * cents < stop), "signal consistency")
    }
  }

  test("llm_refusal_audit: both safety rates land where planted, detector exact") {
    val r = SparkEntry.queries("llm_refusal_audit")(spark, sf).collect().head
    assert(r.getLong(4) == 0, "two-phrase lexicon must recover every refusal")
    assert(r.getBoolean(7), "90%/5% plant must grade calibrated")
    assert(r.getLong(5) > 820000L && r.getLong(5) < 980000L, s"refusal: $r")
    assert(r.getLong(6) < 100000L, s"overrefusal: $r")
  }
}
