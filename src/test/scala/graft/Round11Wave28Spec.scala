package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic checks for round-11 wave 28: clustering depth, PR-AUC,
  * negative-binomial moments.
  */
class Round11Wave28Spec extends AnyFunSuite with SparkFixture {

  test("warehouse_clustering_depth: modulo interleaves fully, range is disjoint") {
    val rows = SparkEntry.queries("warehouse_clustering_depth")(spark, sf).collect()
    val byL = rows.map(r => r.getString(0) -> r).toMap
    val m = byL("modulo"); val rg = byL("range")
    assert(m.getLong(1) == 8 && rg.getLong(1) == 8, "eight files each")
    assert(m.getLong(2) == 8, s"modulo: every file spans the range → depth 8: $m")
    assert(m.getLong(3) == 28, "all C(8,2) pairs overlap")
    assert(rg.getLong(2) == 1, s"range buckets are disjoint → depth 1: $rg")
    assert(rg.getLong(3) == 0, "no overlapping pairs after re-clustering")
  }

  test("agg_auc_pr: far above the 10% baseline, below 1") {
    val r = SparkEntry.queries("agg_auc_pr")(spark, sf).collect().head
    assert(r.getBoolean(4), "planted +300k lift must be informative")
    val auc = r.getLong(2)
    assert(auc > 5 * r.getLong(3) && auc <= 1000000L, s"auc_pr: $r")
    // ~10% positives
    assert(r.getLong(0) * 6 < r.getLong(1), "imbalanced plant")
  }

  test("agg_negbin_moments: mixture is overdispersed with sane r, p") {
    val r = SparkEntry.queries("agg_negbin_moments")(spark, sf).collect().head
    assert(r.getBoolean(2), "3-rate mixture must be overdispersed")
    assert(r.getLong(3) > 0, "r defined (v > m)")
    val p = r.getLong(4)
    assert(p > 0 && p < 1000000L, s"p is a proper fraction: $p")
  }
}
