package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic checks for round-11 wave 8: state tracking, autocorrelation
  * diagnostics, RoPE planning, metadata columns.
  */
class Round11Wave8Spec extends AnyFunSuite with SparkFixture {

  test("win_kalman_ab: prediction law holds and the filter tracks the level") {
    val rows = SparkEntry.queries("win_kalman_ab")(spark, sf).collect()
    assert(rows.nonEmpty)
    val daily = Tables.events(spark, sf)
      .groupBy(col("event_type"), expr("CAST(ts_us DIV 86400000000 AS BIGINT)").as("day"))
      .agg(sum(floor(col("value") * 100).cast("bigint")).as("cents"))
      .groupBy("event_type").agg(min("cents").as("mn"), max("cents").as("mx"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    rows.foreach { r =>
      assert(r.getLong(4) == r.getLong(2) + r.getLong(3),
        s"pred_next must be level + trend: $r")
      val (mn, mx) = daily(r.getString(0))
      val span = mx - mn
      assert(r.getLong(2) >= mn - span && r.getLong(2) <= mx + span,
        s"filter level must stay near the observed range: $r")
    }
  }

  test("agg_ljung_box: c0 dominates and the verdict matches the cleared Q") {
    val r = SparkEntry.queries("agg_ljung_box")(spark, sf).collect().head
    val n = r.getLong(0)
    assert(n > 10)
    val c0 = r.getLong(1)
    assert(c0 > 0)
    Seq(2, 3, 4).foreach(i => assert(math.abs(r.getLong(i)) <= c0,
      s"|c$i| must be <= c0 (Cauchy-Schwarz): $r"))
    assert(r.getBoolean(6) == (r.getLong(5) > 7815L))
  }

  test("llm_rope_scaling_plan: buckets partition and grow with the window") {
    val rows = SparkEntry.queries("llm_rope_scaling_plan")(spark, sf).collect()
    assert(rows.length == 4)
    rows.foreach { r =>
      assert(r.getLong(2) + r.getLong(3) + r.getLong(4) == r.getLong(1),
        "fit + interpolated + overflow must partition the sequences")
    }
    val byTarget = rows.sortBy(_.getLong(0))
    assert(byTarget.map(_.getLong(4)).toSeq == byTarget.map(_.getLong(4)).sortBy(-_).toSeq,
      "overflow must shrink as the window grows")
    assert(byTarget.map(_.getLong(2)).distinct.length == 1,
      "base-fit count is window-independent")
  }

  test("source_metadata_columns: every partition's path tells the truth") {
    val rows = SparkEntry.queries("source_metadata_columns")(spark, sf).collect()
    assert(rows.length == 3)
    assert(rows.forall(_.getBoolean(3)))
    assert(rows.map(_.getLong(1)).sum == Tables.orders(spark, sf).count())
  }
}
