package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic checks for the round-10 wave-20 ops beyond the oracle gate. */
class Round10Wave20Spec extends AnyFunSuite with SparkFixture {

  test("agg_capture_recapture: the estimator brackets the truth at p=1/4 samples") {
    val r = SparkEntry.queries("agg_capture_recapture")(spark, sf).collect().head
    val (trueN, nA, nB, ov, est) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    assert(ov >= 1 && ov <= math.min(nA, nB))
    assert(est == nA * nB / ov, "Lincoln-Petersen algebra")
    // with two independent 25% samples the estimate lands near truth
    assert(math.abs(r.getLong(5)) < 300000, s"error beyond 30%: $r")
    assert(trueN == Tables.customer(spark, sf).count())
  }

  test("llm_canary_audit: every planted canary found exactly once") {
    val r = SparkEntry.queries("llm_canary_audit")(spark, sf).collect().head
    assert(r.getLong(0) == 20, "twenty canaries planted")
    assert(r.getLong(1) == 20, "every canary found exactly once")
    assert(r.getLong(2) == 1, "no marker collides into a second document")
    assert(r.getLong(3) == 1000000, "perfect recall in ppm")
  }

  test("llm_rrf_fusion: fused list rewards agreement across rankings") {
    val rows = SparkEntry.queries("llm_rrf_fusion")(spark, sf).collect()
    assert(rows.length == 10)
    val scores = rows.map(_.getLong(3))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b }, "ranked")
    rows.foreach { r =>
      val (r1, r2, s) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(s == 1000000000L / (60 + r1) + 1000000000L / (60 + r2),
        s"RRF surrogate algebra: $r")
    }
  }
}
