package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic checks for the round-10 wave-14 ops beyond the oracle gate. */
class Round10Wave14Spec extends AnyFunSuite with SparkFixture {

  test("warehouse_id_allocator: blocks tile [0, total) with no gaps or overlaps") {
    val rows = SparkEntry.queries("warehouse_id_allocator")(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getBoolean(5)), "every block must tile")
    val sorted = rows.sortBy(_.getLong(3))
    assert(sorted.head.getLong(3) == 0, "first block starts at zero")
    assert(sorted.map(_.getLong(2)).sum == Tables.orders(spark, sf).count(),
      "blocks cover exactly the row count")
  }

  test("agg_markov_stationary: probability mass approximately conserved, all states") {
    val rows = SparkEntry.queries("agg_markov_stationary")(spark, sf).collect()
    assert(rows.length >= 3, "several event types exist")
    val mass = rows.map(_.getLong(1)).sum
    val expect = rows.length * 1000000L
    // each iteration loses at most 1 mu-unit per (state, edge) to DIV
    assert(mass <= expect && mass > expect - 50000, s"mass drifted: $mass / $expect")
    rows.foreach(r => assert(r.getLong(1) >= 0))
  }

  test("llm_injection_screen: totals dominate flags, flags bounded by docs") {
    val rows = SparkEntry.queries("llm_injection_screen")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1), "flags bounded by docs")
      assert(r.getLong(3) >= r.getLong(2), "hits dominate flagged docs")
    }
  }
}
