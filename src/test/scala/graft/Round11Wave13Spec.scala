package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic checks for round-11 wave 13: MCC, multiclass F1, VaR/CVaR,
  * resource-allocation link prediction.
  */
class Round11Wave13Spec extends AnyFunSuite with SparkFixture {

  test("agg_mcc: 80%-faithful predictor lands near mcc² ≈ 0.36, strong") {
    val r = SparkEntry.queries("agg_mcc")(spark, sf).collect().head
    val (n, tp, fp, tn, fn) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    assert(tp + fp + tn + fn == n, "confusion partitions the corpus")
    assert(r.getLong(5) > 0, "planted predictor correlates positively")
    // E[mcc] = 1 - 2·flip = 0.6 → mcc² ≈ 0.36; wide band for md5 noise
    assert(r.getLong(6) > 250000 && r.getLong(6) < 480000, s"mcc2_ppm: $r")
    assert(r.getBoolean(7), "|MCC| > 0.5 verdict")
  }

  test("agg_f1_multiclass: marginals conserve, macro tracks micro") {
    val r = SparkEntry.queries("agg_f1_multiclass")(spark, sf).collect().head
    val n = r.getLong(0)
    val tp = Seq(1, 4, 7).map(r.getLong); val fp = Seq(2, 5, 8).map(r.getLong)
    val fn = Seq(3, 6, 9).map(r.getLong)
    assert((tp, fn).zipped.map(_ + _).sum == n, "truth marginals sum to n")
    assert((tp, fp).zipped.map(_ + _).sum == n, "pred marginals sum to n")
    val micro = r.getLong(10); val macroF1 = r.getLong(14)
    assert(micro > 700000 && micro < 900000, s"micro ≈ 80%: $micro")
    assert(math.abs(micro - macroF1) < 100000, "balanced classes: macro ≈ micro")
  }

  test("agg_cvar_es: CVaR dominates VaR, k is the 5% ceiling") {
    val rows = SparkEntry.queries("agg_cvar_es")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) == (r.getLong(1) + 19) / 20, s"k = ceil(n/20): $r")
      assert(r.getLong(4) >= r.getLong(3), s"CVaR >= VaR (mean of tail >= its min): $r")
    }
  }

  test("graph_resource_alloc_link_pred: same candidate pairs as jaccard, bounded terms") {
    val ra = SparkEntry.queries("graph_resource_alloc_link_pred")(spark, sf).collect()
    val jc = SparkEntry.queries("graph_jaccard_link_pred")(spark, sf).collect()
    assert(ra.map(r => (r.getLong(0), r.getLong(1))).toSet ==
      jc.map(r => (r.getLong(0), r.getLong(1))).toSet,
      "both predictors score exactly the non-adjacent common-neighbor pairs")
    ra.foreach { r =>
      val cn = r.getLong(2); val micro = r.getLong(3)
      assert(micro > 0 && micro <= cn * 500000,
        s"each common neighbor contributes (0, 1/2] since deg(z) >= 2: $r")
    }
  }
}
