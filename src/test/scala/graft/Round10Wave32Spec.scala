package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic checks for the round-10 wave-32 ops beyond the oracle gate. */
class Round10Wave32Spec extends AnyFunSuite with SparkFixture {

  test("agg_jarque_bera: moments well-defined; JB non-negative; uniform-ish cents reject normality") {
    val rows = SparkEntry.queries("agg_jarque_bera")(spark, sf).collect()
    assert(rows.length >= 2, "one row per event_type")
    rows.foreach { r =>
      val s2 = r.getDouble(2)
      val kurt = r.getDouble(3)
      val jb = r.getDouble(4)
      assert(s2 >= 0.0, s"skewness squared cannot be negative: $r")
      assert(kurt > 0.0 && kurt < 50.0, s"kurtosis plausible range: $r")
      assert(jb >= 0.0 && !jb.isNaN, s"JB non-negative: $r")
      // JB recomposes from its own emitted parts
      val n = r.getLong(1).toDouble
      assert(math.abs(jb - n * (s2 / 6.0 + (kurt - 3.0) * (kurt - 3.0) / 24.0)) < 1e-6 * (1 + jb))
    }
  }

  test("agg_page_trend: planted monotone shift orders rank sums and flags the trend") {
    val r = SparkEntry.queries("agg_page_trend")(spark, sf).collect().head
    val n = r.getLong(0)
    val (rs0, rs1, rs2) = (r.getLong(1), r.getLong(2), r.getLong(3))
    assert(rs0 + rs1 + rs2 == 6 * n, "per-doc ranks 1+2+3 tile")
    assert(rs0 < rs1 && rs1 < rs2, "planted +80 shift orders the rank sums")
    val l = r.getLong(4)
    assert(l == rs0 + 2 * rs1 + 3 * rs2)
    assert(l > 12 * n, "L beats its null expectation")
    assert(r.getBoolean(7), "directional trend must flag")
  }

  test("win_donchian: channel is prior-only; signals consistent with bounds") {
    val rows = SparkEntry.queries("win_donchian")(spark, sf).collect()
    assert(rows.nonEmpty)
    var breakouts = 0
    rows.foreach { r =>
      val (cents, hi, lo, sig) = (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(hi >= lo, s"channel ordering: $r")
      if (sig == 1L) { assert(cents > hi); breakouts += 1 }
      else if (sig == -1L) { assert(cents < lo); breakouts += 1 }
      else assert(cents >= lo && cents <= hi, s"inside-channel row: $r")
    }
    // an exclusive frame CAN break its channel - some breakouts must exist
    assert(breakouts > 0, "uniform noise over 20-row channels must break out sometimes")
  }
}
