package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic check for the round-10 wave-29 op beyond the oracle gate. */
class Round10Wave29Spec extends AnyFunSuite with SparkFixture {

  test("agg_split_gini: impurities bounded by the 5-class maximum; weights tile") {
    val rows = SparkEntry.queries("agg_split_gini")(spark, sf).collect()
    assert(rows.length == 5, "one branch per segment")
    rows.foreach { r =>
      // 5 priority classes: impurity in [0, 1 - 1/5] = [0, 800000] ppm
      assert(r.getLong(2) >= 0 && r.getLong(2) <= 800000, s"impurity range: $r")
      assert(r.getLong(3) <= r.getLong(2), "weighted share bounded by own impurity")
      assert(r.getLong(4) >= 0 && r.getLong(4) <= 800000)
    }
    // split gain: parent impurity >= weighted sum of children (within
    // the per-branch DIV floors: one ulp each)
    val weighted = rows.map(_.getLong(3)).sum
    val parent = rows.head.getLong(4)
    assert(parent >= weighted - rows.length, s"gain must be non-negative: $parent vs $weighted")
  }
}
