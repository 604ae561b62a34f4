package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic checks for the round-10 wave-40 ops beyond the oracle gate. */
class Round10Wave40Spec extends AnyFunSuite with SparkFixture {

  test("graph_scc: labels are reachability minima; confirmed set is consistent") {
    val rows = SparkEntry.queries("graph_scc")(spark, sf).collect()
    assert(rows.length == 25, "one row per nation node")
    rows.foreach { r =>
      val (node, lf, lb) = (r.getInt(0).toLong, r.getLong(1), r.getLong(2))
      assert(lf <= node && lb <= node, "min-label sweeps can only lower the label")
      assert(r.getBoolean(3) == (lf == lb), "confirmed iff forward = backward minimum")
      assert(r.getLong(4) == (if (lf == lb) lf else -1L), "scc id consistent")
    }
    // node 0 is always its own SCC root (no smaller ancestor exists)
    val n0 = rows.find(_.getInt(0) == 0).get
    assert(n0.getLong(1) == 0L && n0.getLong(2) == 0L && n0.getBoolean(3))
    assert(rows.count(_.getBoolean(3)) >= 1, "at least the root's SCC confirms")
  }

  test("llm_best_of_n: oracle >= picked >= baseline-on-average; regret non-negative") {
    val r = SparkEntry.queries("llm_best_of_n")(spark, sf).collect().head
    val (pickedSum, oracleSum, firstSum) = (r.getLong(1), r.getLong(2), r.getLong(3))
    assert(oracleSum >= pickedSum, "true best bounds the noisy pick")
    assert(pickedSum > firstSum, "BoN with a decent proxy beats sample-1 in aggregate")
    assert(r.getLong(5) >= 0, "regret is non-negative by construction")
    val winRate = r.getLong(6)
    assert(winRate > 500000 && winRate <= 1000000, s"pick wins most groups: $winRate")
  }

  test("llm_self_consistency: majority voting beats a single sample") {
    val r = SparkEntry.queries("llm_self_consistency")(spark, sf).collect().head
    val (n, singleHits, majHits) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(singleHits <= n && majHits <= n)
    // effective per-sample accuracy ~55%: single lands in a wide band
    assert(singleHits * 10 > n * 4 && singleHits * 10 < n * 7, s"single-sample band: $singleHits/$n")
    assert(majHits > singleHits, "5-vote majority must amplify p>0.5 accuracy")
    assert(r.getLong(5) == r.getLong(4) - r.getLong(3), "gain is the ppm difference")
  }
}
