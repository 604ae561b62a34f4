package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic checks for the round-10 wave-33 ops beyond the oracle gate. */
class Round10Wave33Spec extends AnyFunSuite with SparkFixture {

  test("llm_ndcg: idcg dominates dcg; ndcg in ppm range; ideal ordering maximal") {
    val rows = SparkEntry.queries("llm_ndcg")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (dcg, idcg, ndcg) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(idcg >= dcg, s"ideal ranking maximizes fixed-point DCG: $r")
      assert(ndcg >= 0 && ndcg <= 1000000, s"ndcg ppm range: $r")
      if (idcg > 0) assert(ndcg == dcg * 1000000L / idcg)
    }
    // random scores vs graded rel: mean ndcg must sit strictly inside (0, 1)
    val mean = rows.map(_.getLong(3)).sum / rows.length
    assert(mean > 200000 && mean < 999999, s"random ranking is neither perfect nor empty: $mean")
  }

  test("agg_bowley_skew: quartiles ordered; near-uniform cents keep |skew| small") {
    val rows = SparkEntry.queries("agg_bowley_skew")(spark, sf).collect()
    assert(rows.length >= 2)
    rows.foreach { r =>
      val (q1, q2, q3) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(q1 <= q2 && q2 <= q3, s"quartile ordering: $r")
      val b = r.getLong(5)
      assert(b >= -1000000 && b <= 1000000, s"Bowley bounded by construction: $r")
    }
  }

  test("agg_grubbs: deviation bounded by range; G^2 consistent with alarm") {
    val rows = SparkEntry.queries("agg_grubbs")(spark, sf).collect()
    assert(rows.length >= 2)
    rows.foreach { r =>
      val (n, maxdev) = (r.getLong(1), r.getLong(2))
      assert(maxdev >= 0 && maxdev < n * 5000000L, s"deviation sane: $r")
      val g2 = r.getLong(4)
      assert(g2 >= 0, s"G^2 non-negative: $r")
      // G^2 <= (n-1)^2/n * 1e6 is the algebraic max for the Grubbs statistic
      assert(g2 <= (n - 1) * (n - 1) * 1000000L / n + 1, s"G^2 algebraic bound: $r")
      assert(r.getBoolean(5) == (g2 > 16000000L), "alarm is the cross-multiplied threshold")
    }
  }
}
