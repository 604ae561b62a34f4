package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic checks for the round-10 wave-35 ops beyond the oracle gate. */
class Round10Wave35Spec extends AnyFunSuite with SparkFixture {

  test("agg_sprt: planted p=0.6 stream accepts H1, never H0 first") {
    val r = SparkEntry.queries("agg_sprt")(spark, sf).collect().head
    val (n, succ) = (r.getLong(0), r.getLong(1))
    // planted 60% success rate shows up in the raw counts
    assert(succ * 10 > n * 5 && succ * 10 < n * 7, s"planted rate visible: $succ/$n")
    assert(r.getLong(2) >= 2944439L, "the walk must cross the accept bound")
    val decision = r.getString(6)
    assert(decision == "accept_h1", s"p=0.6 stream must accept H1: $decision")
    val firstAccept = r.getLong(4)
    assert(firstAccept >= 1 && firstAccept < n, s"sequential stop strictly early: $firstAccept")
  }

  test("llm_dp_epsilon_ledger: composition exact; heavy analysts flagged") {
    val rows = SparkEntry.queries("llm_dp_epsilon_ledger")(spark, sf).collect()
    assert(rows.length >= 10 && rows.length <= 20, s"analyst buckets bounded by the modulus: ${rows.length}")
    rows.foreach { r =>
      val (nq, spent) = (r.getLong(1), r.getLong(2))
      assert(spent >= nq * 50000L && spent <= nq * 250000L, s"pricing bounds: $r")
      assert(r.getBoolean(3) == (spent > 3000000L), "budget verdict consistent")
      assert(r.getLong(4) == math.max(spent - 3000000L, 0L), "overspend exact")
    }
    assert(rows.exists(_.getBoolean(3)), "hundreds of queries per analyst must blow a 3.0-eps budget")
  }

  test("agg_trimmed_mean: trimming drops ~10%; both means inside the kept range") {
    val rows = SparkEntry.queries("agg_trimmed_mean")(spark, sf).collect()
    assert(rows.length >= 2)
    rows.foreach { r =>
      val (n, kept) = (r.getLong(1), r.getLong(4))
      assert(kept == n - 2 * (n / 20), s"exactly bottom+top 5% shed: $r")
      val (mean, tmean) = (r.getLong(5), r.getLong(6))
      assert(math.abs(mean - tmean) < 5000, s"centered data: means within 50 units: $r")
    }
  }
}
