package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic checks for the round-10 wave-27 ops beyond the oracle gate. */
class Round10Wave27Spec extends AnyFunSuite with SparkFixture {

  test("llm_lr_schedule_plan: phases tile the token budget exactly") {
    val rows = SparkEntry.queries("llm_lr_schedule_plan")(spark, sf).collect()
      .sortBy(_.getString(0))
    assert(rows.length == 3)
    assert(rows.head.getLong(1) == 0, "warmup starts at token zero")
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getLong(2) == b.getLong(1), "phase boundary must be shared")
    }
    val shares = rows.map(_.getLong(5))
    assert(math.abs(shares(0) - 80000) < 2000 &&
      math.abs(shares(1) - 800000) < 2000 &&
      math.abs(shares(2) - 120000) < 2000, s"8/80/12 split drifted: ${shares.toSeq}")
    rows.foreach(r => assert(r.getLong(4) >= 1, "every phase takes steps"))
  }

  test("llm_swa_savings: savings only past the window, monotone in band") {
    val rows = SparkEntry.queries("llm_swa_savings")(spark, sf).collect()
      .sortBy(_.getLong(0))
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (band, full, swa, ppm) =
        (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(swa <= full)
      if (band <= 1) assert(ppm == 0, "docs inside the window save nothing")
      assert(ppm >= 0 && ppm < 1000000)
    }
    val ppms = rows.map(_.getLong(4))
    assert(ppms.zip(ppms.tail).forall { case (a, b) => a <= b },
      "longer docs must save at least as much")
  }
}
