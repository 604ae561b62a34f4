package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape guards for the late round-9 waves: the physical plans that
  * carry the 100-TB posture must actually be the plans Spark runs.
  */
class Round9PlanGuards2Spec extends AnyFunSuite with SparkFixture {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("join_point_in_time runs on the native as-of merge operator") {
    val p = plan("join_point_in_time")
    assert(p.contains("AsOfJoin"),
      s"PIT join fell off the single-merge-pass operator:\n${p.take(3000)}")
  }

  test("mm_dedup_phash keeps the band-population cap as a semi join") {
    val p = plan("mm_dedup_phash")
    assert(p.contains("LeftSemi"),
      s"the dfCap filter must stay a semi join (no capped-bucket materialization):\n${p.take(3000)}")
  }

  test("agg_ks_drift partitions its CDF windows by band (no global sort task)") {
    val p = plan("agg_ks_drift")
    assert(p.contains("hashpartitioning(band"),
      s"banded two-phase CDF lost its band partitioning:\n${p.take(3000)}")
  }

  test("agg_rfm rank windows stay region-partitioned") {
    val p = plan("agg_rfm")
    assert(p.contains("hashpartitioning(region"),
      s"RFM ntile must not collapse to a global window:\n${p.take(3000)}")
  }

  test("llm_feature_hashing is one scan-side projection + one aggregate (no join, no window)") {
    val p = plan("llm_feature_hashing")
    assert(!p.contains("Join") && !p.contains("Window"),
      s"the hashing trick must stay vocabulary-free:\n${p.take(3000)}")
    assert(p.contains("HashAggregate"))
  }
}
