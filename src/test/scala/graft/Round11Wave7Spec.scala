package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic checks for round-11 wave 7: graph distance extremes, triad
  * census, EXIF audit, SQL scripting.
  */
class Round11Wave7Spec extends AnyFunSuite with SparkFixture {

  test("graph_eccentricity: radius <= ecc <= diameter, verdicts consistent") {
    val rows = SparkEntry.queries("graph_eccentricity")(spark, sf).collect()
    assert(rows.nonEmpty)
    val (radius, diameter) = (rows.head.getLong(3), rows.head.getLong(4))
    assert(radius >= 1 && radius <= diameter)
    assert(diameter <= 2 * radius, "metric space law: diam <= 2*radius")
    rows.foreach { r =>
      assert(r.getLong(2) >= radius && r.getLong(2) <= diameter)
      assert(r.getBoolean(5) == (r.getLong(2) == radius))
      assert(r.getBoolean(6) == (r.getLong(2) == diameter))
    }
    assert(rows.exists(_.getBoolean(5)) && rows.exists(_.getBoolean(6)))
  }

  test("graph_triad_census: dyads partition the node pairs") {
    val r = SparkEntry.queries("graph_triad_census")(spark, sf).collect().head
    val n = r.getLong(0)
    assert(r.getLong(2) + r.getLong(3) + r.getLong(4) == n * (n - 1) / 2,
      "mutual + asym + null must cover every unordered pair")
    // edges reconcile: each mutual pair holds 2 directed edges, asym 1
    assert(r.getLong(1) == 2 * r.getLong(2) + r.getLong(3),
      "directed edge count must equal 2*mutual + asym")
    assert(r.getLong(5) >= 0 && r.getLong(6) >= 0)
  }

  test("mm_exif_audit: ledger counts bounded and verdict tracks gps") {
    val rows = SparkEntry.queries("mm_exif_audit")(spark, sf).collect()
    assert(rows.nonEmpty)
    val staged = Tables.documents(spark, sf).where(col("doc_id") % 40 === 0).count()
    assert(rows.map(_.getLong(1)).sum == staged)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1) && r.getLong(3) <= r.getLong(1))
      assert(r.getBoolean(6) == (r.getLong(2) > 0))
    }
  }

  test("api_sql_scripting: loop accumulates exactly the direct rollup") {
    val r = SparkEntry.queries("api_sql_scripting")(spark, sf).collect().head
    assert(r.getLong(2) == 3L, "the WHILE must run exactly 3 iterations")
    assert(r.getLong(0) == Tables.orders(spark, sf).count())
  }
}
