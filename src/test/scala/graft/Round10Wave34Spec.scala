package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic checks for the round-10 wave-34 ops beyond the oracle gate. */
class Round10Wave34Spec extends AnyFunSuite with SparkFixture {

  test("win_cusum: statistics non-negative; centered uniform noise stays un-alarmed mostly") {
    val rows = SparkEntry.queries("win_cusum")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(3) >= 0, s"S+ is max(0,...)-shaped: $r")
      assert(r.getLong(4) >= 0, s"S- is max(0,...)-shaped: $r")
    }
    rows.foreach { r =>
      val (sHi, sLo, alarm) = (r.getLong(3), r.getLong(4), r.getLong(5))
      if (alarm == 1L) assert(sHi > 500000L, s"up-alarm implies S+ over threshold: $r")
      else if (alarm == -1L) assert(sHi <= 500000L && sLo > 500000L, s"down-alarm: $r")
      else assert(sHi <= 500000L && sLo <= 500000L, s"quiet row under both thresholds: $r")
    }
    // a persistent mean offset accumulates: at least one side must alarm
    // somewhere (CUSUM's point is exactly that small biases grow linearly)
    assert(rows.exists(_.getLong(5) != 0L), "accumulated drift must surface")
  }

  test("fn_zorder_curve: every 64-cell morton block is an exact 8x8 tile") {
    val rows = SparkEntry.queries("fn_zorder_curve")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(6), s"locality theorem must hold for every tile: $r")
      // tiles partition the 16-bit space: x/y mins must be multiples of 8
      assert(r.getLong(2) % 8 + (r.getLong(2) - r.getLong(2) % 8) == r.getLong(2))
      assert(r.getLong(3) - r.getLong(2) <= 7 && r.getLong(5) - r.getLong(4) <= 7)
    }
  }

  test("llm_kv_cache_plan: byte ledger exact; admission inversely monotone in band length") {
    val rows = SparkEntry.queries("llm_kv_cache_plan")(spark, sf).collect()
      .sortBy(_.getLong(0))
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (band, maxTok) = (r.getLong(0), r.getLong(3))
      assert(maxTok >= band * 512 && maxTok < (band + 1) * 512, s"band bracket: $r")
      assert(r.getLong(4) == maxTok * 131072L, "per-seq bytes exact")
      if (maxTok > 0)
        assert(r.getLong(6) == 17179869184L / (maxTok * 131072L), "admission DIV exact")
    }
    val adm = rows.filter(_.getLong(3) > 0).map(_.getLong(6))
    assert(adm.zip(adm.tail).forall { case (a, b) => a >= b },
      "longer bands admit no more sequences")
  }
}
