package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic checks for round-11 wave 6: the warehouse planning layer. */
class Round11Wave6Spec extends AnyFunSuite with SparkFixture {

  test("warehouse_zorder_layout: z-layout strictly out-prunes linear") {
    val rows = SparkEntry.queries("warehouse_zorder_layout")(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    val (z, l) = (rows("zorder"), rows("linear"))
    assert(z.getLong(4) == l.getLong(4), "matching rows are layout-invariant")
    assert(z.getLong(2) < l.getLong(2),
      s"zorder must scan fewer files: z=${z.getLong(2)} linear=${l.getLong(2)}")
    assert(z.getLong(3) < l.getLong(3), "and fewer rows")
    assert(z.getLong(3) >= z.getLong(4), "scanned rows must cover matches")
  }

  test("warehouse_stats_collect: ndv and extremes are truthful") {
    val rows = SparkEntry.queries("warehouse_stats_collect")(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    val nOrders = Tables.orders(spark, sf).count()
    assert(rows.values.forall(_.getLong(1) == nOrders))
    assert(rows("o_orderkey").getLong(3) == nOrders, "orderkey is unique -> ndv = n")
    assert(rows("o_orderstatus").getLong(3) <= 3)
    assert(rows.values.forall(_.getLong(2) == 0), "no nulls in orders fixture")
    rows.values.foreach(r => assert(r.getString(4) <= r.getString(5)))
  }

  test("warehouse_tablesample: estimator within 10% at 1-in-8") {
    val r = SparkEntry.queries("warehouse_tablesample")(spark, sf).collect().head
    assert(r.getLong(1) > 0 && r.getLong(1) < r.getLong(0))
    assert(math.abs(r.getLong(5)) < 100000L,
      s"1-in-8 hash sample should estimate within 10%: ${r.getLong(5)} ppm")
  }

  test("source_parquet_rowgroup_prune: layout real, pruning real, rollup conserved") {
    val r = SparkEntry.queries("source_parquet_rowgroup_prune")(spark, sf).collect().head
    assert(r.getBoolean(0), "staged file must have multiple row groups")
    assert(r.getBoolean(1), "the mid-range predicate must prune groups")
    val expected = Tables.orders(spark, sf)
      .where(col("o_orderkey").between(r.getLong(2), r.getLong(3))).count()
    assert(r.getLong(4) == expected, "pruned-plan rollup must equal logical filter")
  }
}
