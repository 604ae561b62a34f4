package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic checks for the round-10 wave-30 ops beyond the oracle gate. */
class Round10Wave30Spec extends AnyFunSuite with SparkFixture {

  test("agg_kendall_tau: pair classes tile n0; tau_b in [-1, 1] and positively associated") {
    val r = SparkEntry.queries("agg_kendall_tau")(spark, sf).collect().head
    val (n0, nc, nd, tx, ty) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    // every pair is concordant, discordant, or tied in at least one variable
    assert(nc + nd <= n0, "concordant+discordant cannot exceed all pairs")
    assert(n0 - nc - nd <= tx + ty, "non-C/D pairs must carry a tie")
    val tau = r.getDouble(5)
    assert(tau >= -1.0 && tau <= 1.0, s"tau_b out of range: $tau")
    // price and the customer's order count are independent in the fixture:
    // tau should be small but well-defined (not NaN)
    assert(!tau.isNaN)
    assert(tau == (nc - nd).toDouble /
      math.sqrt((n0 - tx).toDouble * (n0 - ty).toDouble))
  }

  test("agg_kruskal_wallis: rank sums tile the grand total; H matches the closed form") {
    val r = SparkEntry.queries("agg_kruskal_wallis")(spark, sf).collect().head
    val n = r.getLong(0)
    val rs = Seq(1, 3, 5, 7, 9).map(r.getLong)
    val ns = Seq(2, 4, 6, 8, 10).map(r.getLong)
    assert(ns.sum == n, "group sizes tile n")
    assert(rs.sum == n * (n + 1) / 2, "rank sums tile n(n+1)/2")
    val h = r.getDouble(11)
    val expected = 12.0 * rs.zip(ns).map { case (rj, nj) =>
      (rj * rj).toDouble / nj }.sum / (n.toDouble * (n + 1)) - 3.0 * (n + 1)
    assert(math.abs(h - expected) < 1e-6, s"H: $h vs $expected")
    assert(h >= 0.0, "H is non-negative for distinct integer ranks")
  }

  test("win_bollinger: bands bracket the mid; variance numerator non-negative") {
    val rows = SparkEntry.queries("win_bollinger")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val varNum = r.getLong(4)
      assert(varNum >= 0, s"n*Sx2 - Sx^2 must be >= 0: $r")
      val (mid, up, lo) = (r.getDouble(5), r.getDouble(6), r.getDouble(7))
      assert(up >= mid && mid >= lo, s"band ordering: $r")
      // band half-width is exactly 2 sample stddevs
      val sd = math.sqrt(varNum.toDouble / 380.0)
      assert(math.abs((up - mid) - 2.0 * sd) < 1e-9)
    }
  }
}
