package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Composite showcase queries — classic TPC-H shapes adapted to the
  * synthetic schema (it carries most but not all TPC-H columns): the
  * multi-join + aggregate + top-k plans an analytics service actually
  * serves, exercising join ordering, broadcast selection, partial
  * aggregation, and ordered limits in one plan each.
  *
  * Determinism: revenue is an exact decimal sum emitted as double
  * (agg_group law), every ORDER BY ends in a unique key so the LIMIT
  * cut is a total order, and dates are emitted as fixed-width strings
  * (lexicographic == chronological).
  */
object Showcase {
  type Q = (SparkSession, String) => DataFrame

  private def rev(c1: org.apache.spark.sql.Column, c2: org.apache.spark.sql.Column) =
    sum(dec(c1 * (lit(1) - c2))).cast("double")

  val queries: Map[String, Q] = Map(
    // TPC-H Q3 (shipping priority): segment-filtered customers' orders
    // placed before a date with lineitems shipped after it, top-10 by
    // revenue. Customer side is broadcast (segment filter keeps it small
    // relative to the fact); lineitem-orders is the one real shuffle.
    "tpch_q3" -> ((s, d) =>
      Tables.customer(s, d).where(col("c_mktsegment") === "BUILDING")
        .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"))
        .where(col("o_orderdate") < lit("1996-03-15").cast("timestamp"))
        .join(Tables.lineitem(s, d), col("l_orderkey") === col("o_orderkey"))
        .where(col("l_shipdate") > lit("1996-03-15").cast("timestamp"))
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(rev(col("l_extendedprice"), col("l_discount")).as("revenue"))
        .select(col("l_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
          col("o_orderpriority"), col("revenue"))
        .orderBy(col("revenue").desc, col("o_orderdate"), col("l_orderkey"))
        .limit(10)),

    // TPC-H Q5 (local-supplier volume): six-table star join where the
    // customer's and the supplier's nation must coincide, restricted to
    // one region and one order year. region/nation broadcast; the join
    // graph forces the c_nationkey = s_nationkey equi-condition through
    // the fact.
    "tpch_q5" -> ((s, d) => {
      val asia = Tables.region(s, d).where(col("r_name") === "ASIA")
      Tables.customer(s, d)
        .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"))
        .where(col("o_orderdate") >= lit("1997-01-01").cast("timestamp")
          && col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
        .join(Tables.lineitem(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey")
          && col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(asia), col("n_regionkey") === col("r_regionkey"))
        .groupBy("n_name")
        .agg(rev(col("l_extendedprice"), col("l_discount")).as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    }),

    // TPC-H Q10 (returned-item reporting): customers who returned items
    // in a quarter, ranked by lost revenue, top 20 with their nation.
    "tpch_q10" -> ((s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"))
        .where(col("o_orderdate") >= lit("1996-10-01").cast("timestamp")
          && col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
        .join(Tables.lineitem(s, d), col("l_orderkey") === col("o_orderkey"))
        .where(col("l_returnflag") === "R")
        .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
        .agg(rev(col("l_extendedprice"), col("l_discount")).as("revenue"))
        .select(col("c_custkey"), col("c_name"), col("revenue"),
          col("c_acctbal"), col("n_name"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20))
  )

  val oracles: Map[String, String] = Map(
    "tpch_q3" ->
      """SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
        |  o_orderpriority,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM customer, orders, lineitem
        |WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
        |  AND l_orderkey = o_orderkey
        |  AND o_orderdate < TIMESTAMP '1996-03-15 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1996-03-15 00:00:00'
        |GROUP BY l_orderkey, strftime(o_orderdate, '%Y-%m-%d'), o_orderpriority
        |ORDER BY revenue DESC, o_orderdate, l_orderkey LIMIT 10""".stripMargin,

    "tpch_q5" ->
      """SELECT n_name,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM customer, orders, lineitem, supplier, nation, region
        |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        |  AND r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin,

    "tpch_q10" ->
      """SELECT c_custkey, c_name,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |  c_acctbal, n_name
        |FROM customer, orders, lineitem, nation
        |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        |  AND l_returnflag = 'R'
        |  AND o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND c_nationkey = n_nationkey
        |GROUP BY c_custkey, c_name, c_acctbal, n_name
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin
  )
}
