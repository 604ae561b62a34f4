package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic checks for the round-10 wave-38 ops beyond the oracle gate. */
class Round10Wave38Spec extends AnyFunSuite with SparkFixture {

  test("win_seasonal_decompose: the additive identity closes exactly") {
    val rows = SparkEntry.queries("win_seasonal_decompose")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (hMean, trend, seasonal, residual) =
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(hMean == trend + (hMean - trend), "detrending is exact by construction")
      assert(residual == (hMean - trend) - seasonal,
        s"identity hourly = trend + seasonal + residual must close: $r")
      // centered hourly means keep components bounded
      assert(math.abs(seasonal) < 30000 && math.abs(residual) < 30000, s"bounded components: $r")
    }
  }

  test("join_nearest_spatial: neighbor is genuinely nearest within the cell; symmetric pairs sane") {
    val rows = SparkEntry.queries("join_nearest_spatial")(spark, sf).collect()
    assert(rows.nonEmpty)
    val byId = rows.map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    rows.foreach { r =>
      assert(r.getLong(0) != r.getLong(1), "never its own neighbor")
      assert(r.getLong(2) >= 0 && r.getLong(2) <= 2L * 50000 * 50000 * 4,
        s"squared distance bounded by the cell diagonal: $r")
    }
    // nearest-neighbor distance is symmetric-bounded: if b is a's NN, then
    // a's distance to b >= b's distance to ITS nearest
    rows.take(200).foreach { r =>
      byId.get(r.getLong(1)).foreach { case (_, dB) =>
        assert(dB <= r.getLong(2), s"b's own NN can only be closer: $r")
      }
    }
  }

  test("warehouse_ttl_retention_plan: all tiers populate; only delete reclaims; ledger conserves") {
    val rows = SparkEntry.queries("warehouse_ttl_retention_plan")(spark, sf).collect()
    val byTier = rows.map(r => r.getString(0) -> r).toMap
    assert(byTier.keySet == Set("hot", "warm", "delete"), s"30-day span fills all tiers: ${byTier.keySet}")
    rows.foreach { r =>
      assert(r.getLong(3) == r.getLong(2) * 96, "bytes = rows * 96 exactly")
      if (r.getString(0) == "delete") assert(r.getLong(4) == r.getLong(3), "delete tier reclaims itself")
      else assert(r.getLong(4) == 0L, "hot/warm reclaim nothing")
    }
    val totalRows = rows.map(_.getLong(2)).sum
    assert(totalRows == Tables.events(spark, sf).count(), "every event row is tiered exactly once")
  }
}
