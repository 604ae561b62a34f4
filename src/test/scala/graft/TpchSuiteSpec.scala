package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic checks for the TPC-H completion wave (Q4/Q12/Q13/Q15/Q17/
  * Q19/Q22 — the queries expressible on the synthetic schema beyond the
  * earlier Q1/Q3/Q5/Q6/Q7/Q8/Q10/Q14/Q18). Each test proves a conservation
  * or dominance property against an independently-computed reference, not
  * just shape — the DuckDB oracle covers value equality.
  */
class TpchSuiteSpec extends AnyFunSuite with SparkFixture {

  test("tpch_q4: semi-join counts are bounded by the window's order counts per priority") {
    val got = SparkEntry.queries("tpch_q4")(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val windowed = Tables.orders(spark, sf)
      .where(col("o_orderdate") >= lit("1996-07-01").cast("timestamp")
        && col("o_orderdate") < lit("1996-10-01").cast("timestamp"))
      .groupBy("o_orderpriority").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.nonEmpty)
    got.foreach { case (p, n) =>
      assert(n >= 1 && n <= windowed(p), s"priority $p count outside [1, window]")
    }
  }

  test("tpch_q12: high+low line counts conserve the filtered join cardinality") {
    val rows = SparkEntry.queries("tpch_q12")(spark, sf).collect()
    assert(rows.map(_.getString(0)).toSet.subsetOf(Set("A", "R")))
    val total = rows.map(r => r.getLong(1) + r.getLong(2)).sum
    val expected = Tables.orders(spark, sf)
      .join(Tables.lineitem(spark, sf), col("o_orderkey") === col("l_orderkey"))
      .where(col("l_returnflag").isin("A", "R")
        && col("l_shipdate") >= col("o_orderdate") + expr("INTERVAL 90 DAY")
        && col("l_shipdate") >= lit("1996-01-01").cast("timestamp")
        && col("l_shipdate") < lit("1997-01-01").cast("timestamp")).count()
    assert(total == expected, "high+low != filtered join rows")
  }

  test("tpch_q13: custdist conserves customers AND c_count*custdist conserves orders") {
    val rows = SparkEntry.queries("tpch_q13")(spark, sf).collect()
    val customers = Tables.customer(spark, sf).count()
    val keptOrders = Tables.orders(spark, sf)
      .where(col("o_orderpriority") =!= "5-LOW").count()
    assert(rows.map(_.getLong(1)).sum == customers, "customer conservation")
    assert(rows.map(r => r.getLong(0) * r.getLong(1)).sum == keptOrders,
      "order conservation (every non-5-LOW order lands in exactly one bucket)")
  }

  test("tpch_q15: reported revenue is the maximum over an independent rollup") {
    val rows = SparkEntry.queries("tpch_q15")(spark, sf).collect()
    assert(rows.nonEmpty)
    val best = rows.map(_.getDouble(2)).distinct
    assert(best.length == 1, "tied winners must report identical revenue")
    val maxRev = Tables.lineitem(spark, sf)
      .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp")
        && col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
      .groupBy("l_suppkey")
      .agg(sum(expr("CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))")).as("tr"))
      .agg(max(col("tr").cast("double"))).collect()(0).getDouble(0)
    assert(best.head == maxRev, "winner revenue != independent max")
  }

  test("tpch_q17: avg_yearly equals a driver-side exact-cents reference") {
    val row = SparkEntry.queries("tpch_q17")(spark, sf).collect()(0)
    // independent reference: collect the filtered join, apply the 20%-of-
    // part-mean rule in driver code with exact integer cents
    val parts = Tables.part(spark, sf)
      .where(col("p_brand") === "Brand#3" && col("p_size") <= 10)
      .select("p_partkey").collect().map(_.getLong(0)).toSet
    val li = Tables.lineitem(spark, sf)
      .select(col("l_partkey"), col("l_quantity"),
        round(col("l_extendedprice") * 100).cast("long").as("cents"))
      .collect().filter(r => parts.contains(r.getLong(0)))
    if (li.isEmpty) assert(row.isNullAt(0))
    else {
      val byPart = li.groupBy(_.getLong(0))
      var cents = BigInt(0); var any = false
      byPart.foreach { case (_, rs) =>
        val qlim = 0.2 * (rs.map(_.getDouble(1).toLong).sum.toDouble / rs.length.toDouble)
        rs.foreach { r =>
          if (r.getDouble(1) < qlim) { cents += BigInt(r.getLong(2)); any = true }
        }
      }
      if (!any) assert(row.isNullAt(0))
      else assert(row.getDouble(0) == (BigDecimal(cents) / 100).toDouble / 7.0,
        "avg_yearly != exact-cents reference")
    }
  }

  test("tpch_q19: disjunctive revenue equals the sum over an independent row filter") {
    val row = SparkEntry.queries("tpch_q19")(spark, sf).collect()(0)
    val ref = Tables.lineitem(spark, sf)
      .join(Tables.part(spark, sf), col("l_partkey") === col("p_partkey"))
      .where((col("p_brand") === "Brand#1" && col("p_size").between(1, 5)
          && col("l_quantity").between(1, 11))
        || (col("p_brand") === "Brand#2" && col("p_size").between(1, 10)
          && col("l_quantity").between(10, 20))
        || (col("p_brand") === "Brand#3" && col("p_size").between(1, 15)
          && col("l_quantity").between(20, 30)))
      .agg(sum(expr("CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))"))
        .cast("double")).collect()(0)
    if (ref.isNullAt(0)) assert(row.isNullAt(0))
    else assert(row.getDouble(0) == ref.getDouble(0))
  }

  test("tpch_q22: every reported bucket holds only above-average, order-quiet customers") {
    val rows = SparkEntry.queries("tpch_q22")(spark, sf).collect()
    rows.foreach(r => assert(Set(1, 3, 5, 7, 9).contains(r.getInt(0)), "cntrycode domain"))
    // recompute the threshold and the quiet set independently
    val cust = Tables.customer(spark, sf).where(col("c_nationkey").isin(1, 3, 5, 7, 9))
    val avgbal = cust.where(col("c_acctbal") > 0)
      .agg((sum(expr("CAST(c_acctbal AS DECIMAL(18,4))")).cast("double")
        / count(lit(1)).cast("double"))).collect()(0).getDouble(0)
    val recentCust = Tables.orders(spark, sf)
      .where(col("o_orderdate") >= lit("2000-07-01").cast("timestamp"))
      .select("o_custkey").distinct().collect().map(_.getLong(0)).toSet
    val expected = cust.select("c_nationkey", "c_custkey", "c_acctbal").collect()
      .filter(r => r.getDouble(2) > avgbal && !recentCust.contains(r.getLong(1)))
    val expCounts = expected.groupBy(_.getInt(0)).view.mapValues(_.length.toLong).toMap
    assert(rows.map(r => r.getInt(0) -> r.getLong(1)).toMap == expCounts,
      "per-bucket counts != independent recomputation")
  }

  test("tpch_q9: grouped profits sum to the ungrouped total") {
    val rows = SparkEntry.queries("tpch_q9")(spark, sf).collect()
    assert(rows.nonEmpty)
    val total = Tables.lineitem(spark, sf)
      .join(Tables.part(spark, sf).where(col("p_name").like("%red%")),
        col("p_partkey") === col("l_partkey"))
      .agg(sum(expr(
        """CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))
          | - CAST(0.6 * p_retailprice * l_quantity AS DECIMAL(18,4))""".stripMargin))
        .cast("double")).collect()(0).getDouble(0)
    val grouped = rows.map(r => BigDecimal(r.getDouble(2))).sum.toDouble
    assert(math.abs(grouped - total) < 1e-6 * math.abs(total), "profit conservation")
  }

  test("tpch_q21 equals a driver-side replay of the double-EXISTS logic") {
    val lines = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate").cast("timestamp").cast("long").as("us"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val fOrders = Tables.orders(spark, sf).where(col("o_orderstatus") === "F")
      .select(col("o_orderkey"), col("o_orderdate").cast("timestamp").cast("long").as("us")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val names = Tables.supplier(spark, sf).select("s_suppkey", "s_name").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val byOrder = lines.groupBy(_._1)
    val ninetyDaysUs = 90L * 24 * 3600 // cast-to-long = epoch seconds
    val waits = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
    for {
      (ok, ls) <- byOrder; odate <- fOrders.get(ok)
      l1 <- ls if l1._3 > odate + ninetyDaysUs
      others = ls.filter(_._2 != l1._2)
      if others.nonEmpty && !others.exists(_._3 > odate + ninetyDaysUs)
    } waits(names(l1._2)) += 1
    val expected = waits.toSeq.sortBy { case (n, w) => (-w, n) }.take(10)
    val got = SparkEntry.queries("tpch_q21")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == expected, s"replay mismatch: got $got expected $expected")
  }

  test("tpch_q2: each winner's balance is the min over its part's EU suppliers") {
    val rows = SparkEntry.queries("tpch_q2")(spark, sf).collect()
    assert(rows.nonEmpty)
    val euSupp = Tables.supplier(spark, sf)
      .join(Tables.nation(spark, sf), col("s_nationkey") === col("n_nationkey"))
      .join(Tables.region(spark, sf).where(col("r_name") === "EUROPE"),
        col("n_regionkey") === col("r_regionkey"))
      .select("s_suppkey", "s_acctbal").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val pairs = Tables.lineitem(spark, sf).select("l_partkey", "l_suppkey")
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val minPerPart = pairs.filter(p => euSupp.contains(p._2))
      .groupBy(_._1).view.mapValues(_.map(p => euSupp(p._2)).min).toMap
    rows.foreach { r =>
      assert(r.getDouble(0) == minPerPart(r.getLong(3)),
        s"part ${r.getLong(3)} winner balance is not the min")
    }
  }
}
