package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic checks for the round-10 wave-39 ops beyond the oracle gate. */
class Round10Wave39Spec extends AnyFunSuite with SparkFixture {

  test("fn_ipv4_cidr: blocks partition the address space with correct prefixes") {
    val rows = SparkEntry.queries("fn_ipv4_cidr")(spark, sf).collect()
    val byBlock = rows.map(r => r.getString(0) -> r).toMap
    assert(byBlock.contains("public") && byBlock.contains("10.0.0.0/8"),
      s"dense blocks always populate: ${byBlock.keySet}")
    byBlock.get("10.0.0.0/8").foreach { r =>
      assert(r.getLong(2) >> 24 == 10 && r.getLong(3) >> 24 == 10, "all of 10/8 inside")
      assert(r.getString(4).startsWith("10."), "dotted rendering consistent")
    }
    byBlock.get("172.16.0.0/12").foreach { r =>
      assert(r.getLong(2) >> 20 == 2753 && r.getLong(3) >> 20 == 2753)
    }
    // private blocks are tiny slices: public dominates
    val total = rows.map(_.getLong(1)).sum
    assert(byBlock("public").getLong(1) * 10 > total * 9, "public is ~99.6% of random space")
  }

  test("llm_mcq_position_bias: the planted slot-0 pull is detected") {
    val r = SparkEntry.queries("llm_mcq_position_bias")(spark, sf).collect().head
    val n = r.getLong(0)
    val (c0, c1, c2, c3) = (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    assert(c0 + c1 + c2 + c3 == n, "every prediction lands in a slot")
    assert(c0 > c1 && c0 > c2 && c0 > c3, s"slot 0 must dominate: $c0 vs $c1 $c2 $c3")
    assert(r.getBoolean(7), "the uniformity chi-square must flag the bias")
    // slot-0 accuracy is DILUTED by blind slot-0 guesses: rest beats it
    assert(r.getLong(9) > r.getLong(8), "biased slot scores lower accuracy")
  }

  test("agg_mape_smape: sMAPE bounded by 2e6; both metrics positive on noisy series") {
    val rows = SparkEntry.queries("agg_mape_smape")(spark, sf).collect()
    assert(rows.length >= 2)
    rows.foreach { r =>
      val (n, mape, smape) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(n > 0)
      assert(smape >= 0 && smape <= 2000000, s"sMAPE algebraically <= 200%: $r")
      assert(mape > 0, s"noisy series has nonzero error: $r")
      // for positive a, f: sMAPE <= 2 * MAPE never holds in general, but both
      // stay in the same decade on near-stationary noise
      assert(smape < 10 * (mape + 1), s"same decade: $r")
    }
  }
}
