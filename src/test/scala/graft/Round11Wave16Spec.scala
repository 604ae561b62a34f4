package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic checks for round-11 wave 16: isotonic PAV calibration, TOST
  * equivalence, four-cycle census, hive partition discovery.
  */
class Round11Wave16Spec extends AnyFunSuite with SparkFixture {

  test("agg_isotonic_pav: fit is monotone and pools the planted dip") {
    val rows = SparkEntry.queries("agg_isotonic_pav")(spark, sf).collect()
    assert(rows.length == 20)
    val fit = rows.map(r => r.getLong(0) -> r.getLong(4)).toMap
    val raw = rows.map(r => r.getLong(0) -> r.getLong(3)).toMap
    (0L to 18L).foreach { k =>
      assert(fit(k) <= fit(k + 1), s"fit must be monotone at bin $k")
    }
    // the planted dip at bin 7 violates monotonicity in the raw rates …
    assert(raw(7) < raw(6), "planted raw violation exists")
    // … so the fit cannot equal raw everywhere
    assert((0L to 19L).exists(k => fit(k) != raw(k)), "pooling happened")
    // PAV conserves outcome mass on pooled blocks: Σ n·fit tracks 10⁶·Y
    // within the per-row ppm truncation slack
    val n = rows.map(r => r.getLong(0) -> r.getLong(1)).toMap
    val y = rows.map(r => r.getLong(0) -> r.getLong(2)).toMap
    val massFit = (0L to 19L).map(k => n(k) * fit(k)).sum
    val massY = (0L to 19L).map(y).sum * 1000000L
    val slack = 2L * (0L to 19L).map(n).sum + 40L
    assert(math.abs(massFit - massY) <= slack,
      s"mass conservation: $massFit vs $massY (slack $slack)")
  }

  test("agg_tost_equivalence: equivalent within margin, naive test silent") {
    val r = SparkEntry.queries("agg_tost_equivalence")(spark, sf).collect().head
    assert(r.getBoolean(8), "planted 0.3pp diff within the 5% margin")
    assert(!r.getBoolean(9), "naive two-sided test must NOT fire")
    assert(r.getBoolean(6) && r.getBoolean(7))
    assert(math.abs(r.getLong(4)) < r.getLong(5), "|d| < margin numerator")
  }

  test("graph_four_cycles: diagonal-pair conservation") {
    val rows = SparkEntry.queries("graph_four_cycles")(spark, sf).collect()
    assert(rows.nonEmpty)
    var total = 0L
    rows.foreach { r =>
      val (u, v, cn, rects) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(u < v, "diagonal pairs are canonical")
      assert(cn >= 2 && cn <= 23, "common neighbors bounded by |V|−2")
      assert(rects == cn * (cn - 1) / 2)
      total += rects
    }
    // every 4-cycle is counted by exactly its two diagonals
    assert(total % 2 == 0, s"Σrects must be even, got $total")
    assert(total / 2 > 0, "the backbone has rectangles")
  }

  test("source_hive_partition_infer: inferred partition column prunes at listing") {
    val df = SparkEntry.queries("source_hive_partition_infer")(spark, sf)
    val rows = df.collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1996L, 1997L, 1998L))
    assert(rows.forall(_.getLong(1) > 0))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), "scan must carry partition filters")
    assert(plan.contains("o_year"), "the inferred column drives the pruning")
  }
}
