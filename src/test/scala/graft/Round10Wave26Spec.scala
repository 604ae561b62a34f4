package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic checks for the round-10 wave-26 ops beyond the oracle gate. */
class Round10Wave26Spec extends AnyFunSuite with SparkFixture {

  test("llm_moe_balance: the planted hot expert is caught as collapse") {
    val r = SparkEntry.queries("llm_moe_balance")(spark, sf).collect().head
    val (k, n, sq, maxC, imb) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    assert(k == 8, "all eight experts must receive traffic")
    assert(n == Tables.documents(spark, sf).count())
    assert(imb >= 1000000, "imbalance factor is bounded below by uniform")
    assert(imb <= k * 1000000, "and above by total collapse")
    // expert 0 carries ~47.5% of traffic: imbalance well above 1.5x
    assert(r.getBoolean(5), "the planted hot expert must flag")
    assert(maxC > n / 3, "expert 0 dominates")
    assert(imb == k * sq * 1000000L / (n * n))
  }

  test("agg_friedman: rank sums conserve and the planted shift is significant") {
    val r = SparkEntry.queries("agg_friedman")(spark, sf).collect().head
    val (n, rs0, rs1, rs2) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    // each block hands out ranks 1+2+3 = 6
    assert(rs0 + rs1 + rs2 == 6 * n, "rank mass must conserve per block")
    assert(rs2 > rs1 && rs1 > rs0, "the planted monotone shift must order the sums")
    assert(r.getBoolean(6), "a +25-per-treatment shift over the corpus is significant")
  }
}
