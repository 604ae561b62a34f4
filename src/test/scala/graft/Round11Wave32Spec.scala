package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic checks for round-11 wave 32: 2³ factorial effects,
  * interrupted time series.
  */
class Round11Wave32Spec extends AnyFunSuite with SparkFixture {

  test("agg_factorial_effects: planted effects recovered, dead factor silent") {
    val r = SparkEntry.queries("agg_factorial_effects")(spark, sf).collect().head
    // unweighted-cell-mean effects: A = 20 + 15/2 = 27.5, B = 10 + 15/2
    // = 17.5, AB = 7.5, C = 0 (bands widened for the 500-doc fixture)
    assert(r.getLong(1) > 24000L && r.getLong(1) < 31000L, s"effect A: $r")
    assert(r.getLong(2) > 14000L && r.getLong(2) < 21000L, s"effect B: $r")
    assert(math.abs(r.getLong(3)) < 3000L, s"dead factor C: $r")
    assert(r.getLong(4) > 5000L && r.getLong(4) < 10500L, s"interaction AB: $r")
  }

  test("agg_its_segmented: slope change AND level jump both recovered per type") {
    val rows = SparkEntry.queries("agg_its_segmented")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) > 2900 && r.getLong(1) < 3100, s"pre slope ≈ 3: $r")
      assert(r.getLong(2) > 4900 && r.getLong(2) < 5100, s"post slope ≈ 5: $r")
      // level at the cut: pre ≈ 200 + 3·cut; post extrapolates to
      // pre + 500 + 2 (the first post bar is cut+1) — jump ≈ 500–503
      assert(r.getLong(5) > 490000L && r.getLong(5) < 515000L, s"jump ≈ 500: $r")
    }
  }
}
