package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic checks for round-11 wave 34: OEE, MTBF. */
class Round11Wave34Spec extends AnyFunSuite with SparkFixture {

  test("agg_oee: the three ratios land where planted, product composes") {
    val rows = SparkEntry.queries("agg_oee")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // planted 92% / 96% / 97% with md5 noise at fixture sizes
      assert(r.getLong(2) > 850000L && r.getLong(2) < 980000L, s"availability: $r")
      assert(r.getLong(3) > 900000L, s"performance: $r")
      assert(r.getLong(4) > 900000L, s"quality: $r")
      val oee = r.getLong(5)
      // true OEE = .92·.96·.97 ≈ .857 — straddles the 85% bar with noise
      assert(oee > 750000L && oee < 950000L, s"oee: $r")
      assert(oee <= r.getLong(2) && oee <= r.getLong(3) && oee <= r.getLong(4),
        "the product can never exceed a factor")
    }
  }

  test("win_mtbf: gap accounting conserves and rates match the plant") {
    val rows = SparkEntry.queries("win_mtbf")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nEvents, nGaps, mtbf, maxGap, rate) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(nGaps >= 1 && mtbf > 0)
      assert(maxGap >= mtbf, "the max gap dominates the mean")
      // ~2% failure marks
      assert(rate > 5000L && rate < 60000L, s"failure rate: $r")
      assert(nGaps + 1 <= nEvents)
    }
  }
}
