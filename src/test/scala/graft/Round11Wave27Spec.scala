package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic checks for round-11 wave 27: bucket pruning, star-except,
  * record highs.
  */
class Round11Wave27Spec extends AnyFunSuite with SparkFixture {

  test("warehouse_bucket_pruning: the plan scans ONE bucket of sixteen") {
    val df = SparkEntry.queries("warehouse_bucket_pruning")(spark, sf)
    assert(df.collect().nonEmpty)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("SelectedBucketsCount: 1 out of 16"),
      s"bucket pruning must select exactly one bucket; plan:\n${plan.take(2000)}")
  }

  test("api_sql_star_except: expansion drops exactly the excluded columns") {
    val df = SparkEntry.queries("api_sql_star_except")(spark, sf)
    assert(df.columns.toSeq ==
      Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"),
      s"star-except column set: ${df.columns.mkString(",")}")
    assert(df.collect().nonEmpty)
  }

  test("win_record_highs: every type lands inside the harmonic 3σ band") {
    val rows = SparkEntry.queries("win_record_highs")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(4), s"H_n law violated: $r")
      // E[records] = H_n ≈ ln n + γ: 7–13 for n in the fixture range
      assert(r.getLong(3) > 5000000L && r.getLong(3) < 14000000L,
        s"harmonic micro-sum: $r")
      assert(r.getLong(2) >= 1, "the first element is always a record")
    }
  }
}
