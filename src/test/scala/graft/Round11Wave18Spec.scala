package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic checks for round-11 wave 18: partial correlation, Cronbach's
  * alpha, regression leverage, MapState/ListState streaming.
  */
class Round11Wave18Spec extends AnyFunSuite with SparkFixture {

  test("agg_partial_corr: confounder signature — strong marginal, null partial") {
    val r = SparkEntry.queries("agg_partial_corr")(spark, sf).collect().head
    assert(r.getBoolean(6), "marginal r² must exceed 0.25")
    assert(r.getBoolean(7), "controlling for z must kill the correlation")
    // var(z)/var(z + e) with e~U(50): r² ≈ 833/1041 ≈ 0.64
    assert(r.getLong(4) > 450000L && r.getLong(4) < 800000L, s"rxy2: $r")
    assert(math.abs(r.getLong(5)) < 50000L, s"partial2: $r")
  }

  test("agg_cronbach_alpha: four shared-construct items are reliable") {
    val r = SparkEntry.queries("agg_cronbach_alpha")(spark, sf).collect().head
    assert(r.getBoolean(4), "alpha must clear the 0.7 bar")
    // true alpha = (4/3)(1 − 4·1041/(16·833+4·208)) ≈ 0.94
    assert(r.getLong(3) > 850000L && r.getLong(3) < 1000000L, s"alpha_ppm: $r")
    assert(r.getLong(1) < r.getLong(2), "item variances sum below total (positive covariance)")
  }

  test("agg_regression_influence: exactly the planted far-x points flagged") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("agg_regression_influence")(spark, sf).collect()
    val planted = Tables.documents(spark, sf).where(expr("doc_id < 5")).count()
    assert(rows.length == planted, s"flagged ${rows.length} vs planted $planted")
    rows.foreach { r =>
      assert(r.getLong(0) < 5, "only planted ids")
      assert(r.getLong(1) >= 5000, "planted far-x value")
      assert(r.getLong(3) > 0 && r.getLong(3) <= 1000000L, "leverage is a proper fraction")
    }
  }

  test("stream_state_collections: map and list state fold across batches") {
    val rows = SparkEntry.queries("stream_state_collections")(spark, sf).collect()
    assert(rows.length == 4)
    val u1b2 = rows.find(r => r.getLong(0) == 1 && r.getLong(2) == 3).get
    assert(u1b2.getString(1) == "click:1|purchase:1|view:1")
    assert(u1b2.getLong(3) == 1500 && u1b2.getLong(4) == 1000)
    val u2b2 = rows.find(r => r.getLong(0) == 2 && r.getLong(2) == 2).get
    assert(u2b2.getString(1) == "view:2", "map state increments, not replaces")
    assert(u2b2.getLong(3) == 600, "list state appends across batches")
  }
}
