package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic checks for the round-10 wave-42 ops beyond the oracle gate. */
class Round10Wave42Spec extends AnyFunSuite with SparkFixture {

  test("warehouse_access_anomaly: median is personal; anomalies exceed 2x it") {
    val rows = SparkEntry.queries("warehouse_access_anomaly")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nHours, med, nAnom, peak) = (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(med >= 1, "every analyst has a positive median rate")
      assert(nAnom <= nHours)
      if (nAnom > 0) assert(peak > 2 * med, s"peak anomaly must exceed the fence: $r")
      else assert(peak == 0L, "no anomaly, no peak")
      // hourly Poisson-ish counts: above-2x-median hours are a minority
      assert(nAnom * 3 < nHours + 3, s"anomalies are rare by construction: $r")
    }
  }

  test("llm_grad_noise_scale: the exact rational matches its own components") {
    val r = SparkEntry.queries("llm_grad_noise_scale")(spark, sf).collect().head
    val (n, s1, s2, a2, b) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    assert(n == 64, "64 shards by construction")
    assert(a2 == n * s2 - s1 * s1, "cancellation in exact integers")
    assert(a2 >= 0, "variance numerator non-negative")
    val expected = (BigInt(a2) * n * 1000 / (BigInt(n - 1) * s1 * s1)).toLong
    assert(b == expected, "B_simple recomposes exactly")
    assert(b >= 0 && b < 1000, "tiny noise scale for near-constant shard sums")
  }

  test("fn_bloom_parameters: ceil'd sizes are exact and monotone in keys") {
    val rows = SparkEntry.queries("fn_bloom_parameters")(spark, sf).collect()
      .sortBy(_.getLong(1))
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nKeys, mBits, mBytes) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(mBits == (nKeys * 9585 + 999) / 1000, "ceil division exact")
      assert(mBytes == (mBits + 7) / 8)
      assert(r.getLong(4) == 7L && r.getLong(5) == 9585L)
    }
    val bits = rows.map(_.getLong(2))
    assert(bits.zip(bits.tail).forall { case (a, b) => a <= b }, "more keys, more bits")
  }
}
