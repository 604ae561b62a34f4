package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic checks for round-11 wave 17: RANSAC line, log-rank test,
  * A/D line, slop screen.
  */
class Round11Wave17Spec extends AnyFunSuite with SparkFixture {

  test("agg_ransac_line: recovers the planted slope through 10% wild outliers") {
    val r = SparkEntry.queries("agg_ransac_line")(spark, sf).collect().head
    val (n, inliers, slope) = (r.getLong(5), r.getLong(6), r.getLong(7))
    // ~90% of points are on the y=3x+50±20 band; a true line catches them
    assert(inliers * 10 >= n * 8, s"winner must catch most inliers: $inliers/$n")
    assert(slope >= 2800 && slope <= 3200, s"slope_milli near 3000: $slope")
  }

  test("agg_logrank_test: planted hazard difference flagged, pieces consistent") {
    val r = SparkEntry.queries("agg_logrank_test")(spark, sf).collect().head
    val (o1, e1, v, oe) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(r.getBoolean(4), "planted hazard gap must be significant")
    assert(oe == o1 * 1000000L - e1, "OE identity")
    // arm 1 dies EARLIER (higher hazard): observed > expected
    assert(oe > 0, s"o1=$o1 e1_micro=$e1")
    assert(v > 0, "variance accumulates")
  }

  test("win_adline: per-bar flow bounded by ±vol, cumsum consistency on a type") {
    val rows = SparkEntry.queries("win_adline")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // |CLV| ≤ 1 so |mfv_milli| ≤ vol·1000 ≤ 100000
      assert(math.abs(r.getLong(3)) <= 100000L, s"CLV bound: $r")
    }
  }

  test("llm_slop_screen: planted pollution recovered exactly") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("llm_slop_screen")(spark, sf).collect()
    val docs = Tables.documents(spark, sf)
    val n11 = docs.where(expr("doc_id % 11 = 0")).count()
    val n19 = docs.where(expr("doc_id % 19 = 0 AND doc_id % 11 <> 0")).count()
    val emdash = rows.map(_.getLong(6)).sum
    val delve = rows.map(_.getLong(3)).sum
    val tapestry = rows.map(_.getLong(4)).sum
    val flagged = rows.map(_.getLong(2)).sum
    // base corpus is em-dash-free and slop-free: totals are exactly the plant
    assert(emdash == 2 * n11, s"two em-dashes per 11th doc: $emdash vs ${2 * n11}")
    assert(tapestry >= n11, "tapestry appears once per slop sentence")
    assert(delve >= n11 + n19, "delve planted in both pollution classes")
    // every 11th doc trips the ≥2-hits rule
    assert(flagged >= n11, s"flagged=$flagged n11=$n11")
    rows.foreach { r =>
      assert(r.getLong(7) == r.getLong(2) * 1000000L / r.getLong(1), "ppm consistency")
    }
  }
}
