package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic checks for the round-10 wave-19 ops beyond the oracle gate. */
class Round10Wave19Spec extends AnyFunSuite with SparkFixture {

  test("agg_eb_shrinkage: every segment contracts toward the prior") {
    val rows = SparkEntry.queries("agg_eb_shrinkage")(spark, sf).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      assert(r.getBoolean(6), s"shrinkage must contract toward the prior: $r")
      val (raw, shrunk, global) = (r.getLong(3), r.getLong(4), r.getLong(5))
      // shrunk sits between raw and the global rate (within DIV rounding)
      assert(shrunk >= math.min(raw, global) - 1 && shrunk <= math.max(raw, global) + 1,
        s"shrunk outside the [raw, global] segment: $r")
    }
  }

  test("win_max_concurrency: peak bounded by interval count, at least one overlap") {
    val rows = SparkEntry.queries("win_max_concurrency")(spark, sf).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val (n, peak) = (r.getLong(1), r.getLong(2))
      assert(peak >= 1 && peak <= n, s"peak outside [1, n]: $r")
      // 30-minute intervals over a dense month of events must overlap
      assert(peak > 1, s"expected genuine concurrency in the fixture: $r")
    }
  }

  test("llm_em_f1_eval: F1 bounded, EM implies full overlap") {
    val rows = SparkEntry.queries("llm_em_f1_eval")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (em, np, ng, ov, f1) = (r.getBoolean(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))
      assert(ov <= math.min(np, ng), s"overlap above a set size: $r")
      assert(f1 >= 0 && f1 <= 1000000, s"F1 out of ppm range: $r")
      if (em) assert(ov == np && ov == ng, s"EM must mean identical sets: $r")
    }
  }
}
