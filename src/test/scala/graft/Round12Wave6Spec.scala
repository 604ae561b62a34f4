package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic checks for round-12 wave 6 beyond the oracle gate. */
class Round12Wave6Spec extends AnyFunSuite with SparkFixture {

  test("llm_act_ckpt_plan: checkpointing always saves memory past sqrt break-even") {
    val rows = SparkEntry.queries("llm_act_ckpt_plan")(spark, sf).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val (layers, k, noCkpt, ckpt) =
        (r.getLong(1), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(k * k <= layers && (k + 1) * (k + 1) > layers)
      assert(ckpt < noCkpt, s"ckpt $ckpt must undercut $noCkpt")
      assert(r.getLong(7) < 334000, "recompute overhead must stay under one forward")
    }
  }

  test("fn_ulid_roundtrip: every row decodes back and ULID order is chronological") {
    val rows = SparkEntry.queries("fn_ulid_roundtrip")(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getBoolean(4)), "roundtrip must hold for every row")
    assert(rows.forall(_.getString(1).length == 26))
    // rows arrive ORDER BY ulid; timestamps must be nondecreasing
    val ts = rows.map(_.getLong(2))
    assert(ts.zip(ts.tail).forall { case (a, b) => a <= b },
      "lexicographic ULID order must equal chronological order")
  }

  test("win_renko: brick counts bound the level range walked") {
    val rows = SparkEntry.queries("win_renko")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (up, down, rev) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(up >= 0 && down >= 0 && rev >= 0)
      // reversals can't exceed the smaller directional brick-day count
      assert(rev <= up + down)
    }
  }
}
