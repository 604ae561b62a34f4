package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic checks for round-11 wave 26: volume profile, recall@k,
  * dispersion index.
  */
class Round11Wave26Spec extends AnyFunSuite with SparkFixture {

  test("win_volume_profile: value area holds ≥70% of volume, POC is in it") {
    val rows = SparkEntry.queries("win_volume_profile")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nb, va, vaVol, tot) = (r.getLong(1), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(va >= 1 && va <= nb)
      assert(10 * vaVol >= 7 * tot, s"VA must cover ≥ 70%: $r")
      assert(vaVol <= tot)
    }
  }

  test("llm_recall_at_k: the curve is monotone and the bonus ranks relevance up") {
    val r = SparkEntry.queries("llm_recall_at_k")(spark, sf).collect().head
    val (r1, r5, r10) = (r.getLong(4), r.getLong(5), r.getLong(6))
    assert(r1 <= r5 && r5 <= r10, "nested top-k ⇒ monotone recall")
    // +300 bonus over U[0,1000): a relevant candidate outranks a distractor
    // w.p. ≈ 0.79 ⇒ recall@5 well above the 5/20 random baseline
    assert(r5 > 500000L, s"recall@5: $r")
    assert(r10 > r5, "k=10 must buy something at 3 relevant per query")
    assert(r.getLong(1) <= r.getLong(0), "at most one relevant in top-1 per query")
  }

  test("agg_dispersion_index: same mean, different shape — only uniform flags") {
    val rows = SparkEntry.queries("agg_dispersion_index")(spark, sf).collect()
    val byS = rows.map(r => r.getString(0) -> r).toMap
    assert(byS("uniform").getBoolean(4), "D=2 uniform must flag")
    assert(!byS("two_dice").getBoolean(4), "D≈1.17 dice sum must not")
    assert(byS("uniform").getLong(3) > 1700 && byS("uniform").getLong(3) < 2300)
    assert(byS("two_dice").getLong(3) > 900 && byS("two_dice").getLong(3) < 1450)
  }
}
