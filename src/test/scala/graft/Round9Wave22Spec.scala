package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic checks for the round-9 wave-22 operators beyond the oracle
  * gate: CUPED estimator sanity and late-dimension resolution laws.
  */
class Round9Wave22Spec extends AnyFunSuite with SparkFixture {

  test("agg_cuped_theta: rho2 in [0,1], theta finite, moments tie out") {
    val rows = SparkEntry.queries("agg_cuped_theta")(spark, sf).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getLong(0) == Tables.orders(spark, sf)
      .select(countDistinct("o_custkey")).collect()(0).getLong(0))
    val (theta, rho2) = (r.getDouble(3), r.getDouble(4))
    assert(!theta.isNaN && !theta.isInfinite)
    assert(rho2 >= 0.0 && rho2 <= 1.0, s"rho² must be a squared correlation: $rho2")
    // pre+post spend together must equal total spend
    val total = Tables.orders(spark, sf)
      .select(sum(expr("CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 100 AS BIGINT)")))
      .collect()(0).getLong(0).toDouble
    assert(math.abs(r.getDouble(1) + r.getDouble(2) - total) < 1e-3)
  }

  test("warehouse_late_dim: every fact resolves; placeholder share matches the modulus") {
    val sfDir = sf
    val rows = SparkEntry.queries("warehouse_late_dim")(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
    assert(rows.keySet == Set("on_time", "late"), s"unresolved members remain: $rows")
    rows.values.foreach { case (_, _, ok) => assert(ok, "a placeholder survived the late batch") }
    val custKeys = Tables.orders(spark, sfDir)
      .select(col("o_custkey").cast("long")).distinct().collect().map(_.getLong(0))
    assert(rows("late")._1 == custKeys.count(_ % 7 == 0))
    assert(rows("on_time")._1 == custKeys.count(_ % 7 != 0))
    assert(rows.values.map(_._2).sum == Tables.orders(spark, sfDir).count())
  }
}
