package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic checks for round-11 wave 23: stratified ATE, discrete MMD. */
class Round11Wave23Spec extends AnyFunSuite with SparkFixture {

  test("agg_stratified_ate: stratification recovers the planted +30, naive is biased up") {
    val r = SparkEntry.queries("agg_stratified_ate")(spark, sf).collect().head
    val (ate, naive) = (r.getLong(1), r.getLong(2))
    assert(r.getBoolean(3), "confounding must bias the naive estimate")
    assert(ate > 25000L && ate < 35000L, s"true effect is +30: ate_milli=$ate")
    // z lifts y by 20/stratum and treatment concentrates in high z —
    // the naive bias is worth well over +10
    assert(naive > ate + 5000L, s"naive=$naive ate=$ate")
  }

  test("agg_mmd_buckets: the 40% mass collapse dominates the null split") {
    val r = SparkEntry.queries("agg_mmd_buckets")(spark, sf).collect().head
    assert(r.getBoolean(4), "shift must dominate the A/A null by 10×")
    // 40% of mass moved: MMD² ≈ (0.36)² + 9·(0.04)² ≈ 0.144
    assert(r.getLong(2) > 80000000000L && r.getLong(2) < 220000000000L,
      s"mmd2_shift_e12: $r")
    assert(r.getLong(3) < r.getLong(2) / 10, s"null: $r")
  }
}
