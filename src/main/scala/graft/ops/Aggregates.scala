package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.GeoMean

/** SURVEY.md §2.4 aggregations.
  *
  * Spark plans all of these as two-phase hash aggregation (partial map-side
  * combine → final after shuffle on the group keys) — the shape that scales
  * linearly with input; nothing is collected to the driver.
  */
object Aggregates {
  type Q = (SparkSession, String) => DataFrame

  private def dec(c: Column): Column = c.cast("decimal(18,4)")

  val queries: Map[String, Q] = Map(
    // TPC-H-Q1 pricing summary (the flagship).
    "agg_group" -> ((s, d) =>
      Tables.lineitem(s, d)
        .where(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(dec(col("l_quantity"))).as("sum_qty"),
          sum(dec(col("l_extendedprice"))).as("sum_base_price"),
          sum(dec(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("sum_disc_price"),
          sum((col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax")))
            .cast("decimal(18,6)")).as("sum_charge"),
          round(avg(col("l_quantity")), 4).as("avg_qty"),
          round(avg(col("l_extendedprice")), 4).as("avg_price"),
          round(avg(col("l_discount")), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")),

    "agg_distinct" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(countDistinct(col("l_partkey")).as("nd_part"),
          // l_quantity is integer-valued (1..50) so the distinct-sum is exact
          sum_distinct(col("l_quantity")).as("sd_qty"))
        .orderBy("l_returnflag")),

    // Multiple distinct aggregates in one pass → Spark's Expand-based plan.
    "agg_multi_distinct" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(countDistinct(col("l_partkey")).as("nd_part"),
          countDistinct(col("l_suppkey")).as("nd_supp"),
          countDistinct(col("l_orderkey")).as("nd_ord"))
        .orderBy("l_returnflag")),

    "agg_having" -> ((s, d) =>
      Tables.orders(s, d)
        .groupBy("o_custkey")
        .agg(count(lit(1)).as("n_orders"))
        .where(col("n_orders") >= 15)
        .orderBy("o_custkey")),

    "agg_rollup" -> ((s, d) => {
      // DataFrame rollup directly after a multi-join trips Spark's
      // ambiguous-self-join lint (DATASET_ID_TAG false positive), so the
      // rollup goes through the SQL entry point on the joined projection.
      Tables.customer(s, d)
        .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
        .select("r_name", "n_name")
        .createOrReplaceTempView("cust_geo_v")
      s.sql(
        """SELECT COALESCE(r_name, '(all)') AS r_name, COALESCE(n_name, '(all)') AS n_name,
          |       COUNT(*) AS n_cust, CAST(grouping_id() AS INT) AS gid
          |FROM cust_geo_v GROUP BY ROLLUP (r_name, n_name)
          |ORDER BY gid, r_name, n_name""".stripMargin)
    }),

    "agg_cube" -> ((s, d) =>
      Tables.orders(s, d)
        .cube("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n_orders"),
          sum(dec(col("o_totalprice"))).as("total"),
          grouping_id().cast("int").as("gid"))
        .select(coalesce(col("o_orderstatus"), lit("(all)")).as("status"),
          coalesce(col("o_orderpriority"), lit("(all)")).as("priority"),
          col("n_orders"), col("total"), col("gid"))
        .orderBy("gid", "status", "priority")),

    // SQL entry point (SURVEY.md §3.2): GROUPING SETS via spark.sql.
    "agg_grouping_sets" -> ((s, d) => {
      Tables.orders(s, d).createOrReplaceTempView("orders_v")
      s.sql(
        """SELECT COALESCE(o_orderstatus, '(all)') AS status,
          |       COALESCE(o_orderpriority, '(all)') AS priority,
          |       COUNT(*) AS n_orders, CAST(grouping_id() AS INT) AS gid
          |FROM orders_v
          |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
          |ORDER BY gid, status, priority""".stripMargin)
    }),

    "agg_stats" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          round(stddev_samp(col("l_quantity")), 6).as("sd_qty"),
          round(var_samp(col("l_quantity")), 6).as("var_qty"),
          round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("corr_qp"),
          round(covar_samp(col("l_quantity"), col("l_extendedprice")), 2).as("cov_qp"),
          min(col("l_extendedprice")).as("min_p"),
          max(col("l_extendedprice")).as("max_p"),
          round(expr("percentile(l_extendedprice, 0.5)"), 4).as("med_p"))
        .orderBy("l_returnflag")),

    "agg_collect_sorted" -> ((s, d) =>
      Tables.supplier(s, d)
        .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(array_sort(collect_list(col("s_name"))).as("suppliers"),
          count(lit(1)).as("n_supp"))
        .orderBy("n_name")),

    // Approximate distinct via HyperLogLog++ (no oracle — ScalaTest asserts
    // the estimate is within rsd of the exact count).
    "agg_hll_distinct" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy("event_type")
        .agg(approx_count_distinct(col("user_id"), 0.02).as("approx_users"))
        .orderBy("event_type")),

    // Custom typed UDAF (Aggregator): geometric mean.
    "agg_udaf_geomean" -> ((s, d) => {
      val gm = udaf(GeoMean)
      Tables.orders(s, d)
        .groupBy("o_orderstatus")
        .agg(round(gm(col("o_totalprice")), 2).as("geomean"))
        .orderBy("o_orderstatus")
    })
  )

  val oracles: Map[String, String] = Map(
    "agg_group" ->
      """SELECT l_returnflag, l_linestatus,
        |  SUM(CAST(l_quantity AS DECIMAL(18,4))) AS sum_qty,
        |  SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS sum_base_price,
        |  SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS sum_disc_price,
        |  SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6))) AS sum_charge,
        |  ROUND(AVG(l_quantity), 4) AS avg_qty,
        |  ROUND(AVG(l_extendedprice), 4) AS avg_price,
        |  ROUND(AVG(l_discount), 4) AS avg_disc,
        |  COUNT(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "agg_distinct" ->
      """SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS nd_part,
        |  SUM(DISTINCT l_quantity) AS sd_qty
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "agg_multi_distinct" ->
      """SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS nd_part,
        |  COUNT(DISTINCT l_suppkey) AS nd_supp, COUNT(DISTINCT l_orderkey) AS nd_ord
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "agg_having" ->
      """SELECT o_custkey, COUNT(*) AS n_orders FROM orders
        |GROUP BY o_custkey HAVING COUNT(*) >= 15 ORDER BY o_custkey""".stripMargin,

    "agg_rollup" ->
      """SELECT COALESCE(r_name, '(all)') AS r_name, COALESCE(n_name, '(all)') AS n_name,
        |  COUNT(*) AS n_cust, CAST(GROUPING(r_name, n_name) AS INT) AS gid
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP (r_name, n_name)
        |ORDER BY gid, r_name, n_name""".stripMargin,

    "agg_cube" ->
      """SELECT COALESCE(o_orderstatus, '(all)') AS status,
        |  COALESCE(o_orderpriority, '(all)') AS priority,
        |  COUNT(*) AS n_orders, SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS total,
        |  CAST(GROUPING(o_orderstatus, o_orderpriority) AS INT) AS gid
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY gid, status, priority""".stripMargin,

    "agg_grouping_sets" ->
      """SELECT COALESCE(o_orderstatus, '(all)') AS status,
        |  COALESCE(o_orderpriority, '(all)') AS priority,
        |  COUNT(*) AS n_orders, CAST(GROUPING(o_orderstatus, o_orderpriority) AS INT) AS gid
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
        |ORDER BY gid, status, priority""".stripMargin,

    "agg_stats" ->
      """SELECT l_returnflag,
        |  ROUND(stddev_samp(l_quantity), 6) AS sd_qty,
        |  ROUND(var_samp(l_quantity), 6) AS var_qty,
        |  ROUND(corr(l_quantity, l_extendedprice), 6) AS corr_qp,
        |  ROUND(covar_samp(l_quantity, l_extendedprice), 2) AS cov_qp,
        |  MIN(l_extendedprice) AS min_p, MAX(l_extendedprice) AS max_p,
        |  ROUND(percentile_cont(0.5) WITHIN GROUP (ORDER BY l_extendedprice), 4) AS med_p
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "agg_collect_sorted" ->
      """SELECT n_name, list(s_name ORDER BY s_name) AS suppliers, COUNT(*) AS n_supp
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,

    "agg_udaf_geomean" ->
      """SELECT o_orderstatus, ROUND(EXP(AVG(LN(o_totalprice))), 2) AS geomean
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin
  )
}
