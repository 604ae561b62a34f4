package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Round-12 operators, fourth compilation unit (Round12cOps.scala crossed
  * 2.3k lines). Same paired impl/oracle style, same engine-exactness
  * laws: money in integer cents, rates in integer basis points, every
  * negative-capable division sign-split (Spark DIV truncates, DuckDB //
  * floors), DuckDB SUMs re-CAST from HUGEINT.
  */
object Round12dOps {
  type Q = (SparkSession, String) => DataFrame

  /** 12 unrolled amortization months — balance stays positive by
    * construction (payment = P/24), so every division is non-negative.
    * One generator, both dialects (only the DIV token differs). */
  private def amortSteps(div: String): Seq[(String, String)] =
    (0 until 12).flatMap { k =>
      Seq(
        s"i$k" -> s"bal$k * rate_bp $div 120000",
        s"bal${k + 1}" -> s"bal$k + i$k - pay")
    }

  val queries: Map[String, Q] = Map(
    // Fixed-payment amortization schedule — 12 unrolled months of
    // integer interest accrual (bal·bp DIV 120000) against a declared
    // payment P/24; final balance, total interest, principal retired
    // all exact cents. The per-row ledger shape: embarrassingly
    // parallel, no shuffle at all.
    "fn_amortization" -> ((s, d) => {
      val base = Tables.customer(s, d)
        .where(col("c_custkey") % 5 === 2)
        .select(col("c_custkey").as("ck"))
        .withColumn("principal", expr(
          "(ck % 90000 + 10000) * 20"))
        .withColumn("rate_bp", expr("ck % 400 + 100"))
        .withColumn("pay", expr("principal DIV 24"))
        .withColumn("bal0", col("principal"))
      val walked = amortSteps("DIV").foldLeft(base) { case (df, (n, e)) =>
        df.withColumn(n, expr(e)) }
      walked
        .withColumn("total_interest", expr(
          (0 until 12).map(k => s"i$k").mkString(" + ")))
        .withColumn("principal_paid", expr("principal - bal12"))
        .select("ck", "principal", "rate_bp", "pay", "bal12",
          "total_interest", "principal_paid")
        .orderBy("ck")
    }),

    // Payback period — monthly order inflows per priority, investment =
    // 3× the first month's inflow; first month whose running total
    // crosses it, with the within-month fraction exact milli. One sort,
    // one running sum, one crossing pick.
    "agg_payback_period" -> ((s, d) => {
      val ord = Window.partitionBy("pri").orderBy("mon")
      val cum = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val byPri = Window.partitionBy("pri")
      val fullW = Window.partitionBy("pri").orderBy("mon")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      val crossOrd = Window.partitionBy("pri").orderBy("mon")
      val monthly = Tables.orders(s, d)
        .select(col("o_orderpriority").as("pri"),
          expr("CAST(DATE_FORMAT(o_orderdate, 'yyyyMM') AS BIGINT)")
            .as("mon"),
          floor(col("o_totalprice") * 100).cast("bigint").as("cents"))
        .groupBy("pri", "mon")
        .agg(sum("cents").as("inflow"))
        .withColumn("cumin", sum("inflow").over(cum))
        .withColumn("invest", first("inflow").over(fullW) * 3)
        .withColumn("midx", row_number().over(ord).cast("bigint"))
        .withColumn("nmon", count(lit(1)).over(byPri))
      monthly
        .where(col("cumin") >= col("invest"))
        .withColumn("pick", row_number().over(crossOrd))
        .where(col("pick") === 1)
        .withColumn("frac_milli", expr(
          "(invest - (cumin - inflow)) * 1000 DIV inflow"))
        .select("pri", "invest", "midx", "frac_milli", "nmon")
        .orderBy("pri")
    }),

    // Kelly criterion — f* = (b·p − q)/b with p in ppm and b in milli,
    // sign-split ppm output plus the clamped stake and the raw edge.
    // Pure per-row rational algebra.
    "fn_kelly_criterion" -> ((s, d) => {
      Tables.customer(s, d)
        .where(col("c_custkey") % 7 === 3)
        .select(col("c_custkey").as("ck"))
        .withColumn("p_ppm", expr("ck * 7919 % 500000 + 250000"))
        .withColumn("b_milli", expr("ck * 104729 % 3000 + 500"))
        .withColumn("q_ppm", expr("1000000 - p_ppm"))
        .withColumn("edge_num", expr("b_milli * p_ppm - 1000 * q_ppm"))
        .withColumn("kelly_ppm", expr(
          """CASE WHEN edge_num < 0 THEN -((-edge_num) DIV b_milli)
            |  ELSE edge_num DIV b_milli END""".stripMargin))
        .withColumn("stake_ppm", expr("GREATEST(kelly_ppm, 0L)"))
        .select("ck", "p_ppm", "b_milli", "edge_num", "kelly_ppm",
          "stake_ppm")
        .orderBy("ck")
    }),

    // Odds conversions — decimal milli → fractional milli, American
    // (milli, sign-split by the ≥2.0 branch), implied probability ppm,
    // and the two-outcome overround. Per-row rational algebra only.
    "fn_odds_convert" -> ((s, d) => {
      Tables.part(s, d)
        .where(col("p_partkey") % 13 === 1)
        .select(col("p_partkey").cast("bigint").as("pk"))
        .withColumn("dec1", expr("pk * 37 % 9000 + 1100"))
        .withColumn("dec2", expr("pk * 53 % 9000 + 1100"))
        .withColumn("frac_milli", expr("dec1 - 1000"))
        .withColumn("american_milli", expr(
          """CASE WHEN dec1 >= 2000 THEN (dec1 - 1000) * 100
            |  ELSE -(100000000 DIV (dec1 - 1000)) END""".stripMargin))
        .withColumn("implied1_ppm", expr("1000000000 DIV dec1"))
        .withColumn("implied2_ppm", expr("1000000000 DIV dec2"))
        .withColumn("overround_ppm", expr(
          "implied1_ppm + implied2_ppm - 1000000"))
        .select("pk", "dec1", "dec2", "frac_milli", "american_milli",
          "implied1_ppm", "overround_ppm")
        .orderBy("pk")
    })
  )

  val oracles: Map[String, String] = Map(
    // Same 12-step ledger through the same generator.
    "fn_amortization" -> {
      val walked = amortSteps("//").foldLeft(
        "(SELECT c_custkey AS ck, (c_custkey % 90000 + 10000) * 20 AS principal, " +
          "c_custkey % 400 + 100 AS rate_bp, " +
          "(c_custkey % 90000 + 10000) * 20 // 24 AS pay, " +
          "(c_custkey % 90000 + 10000) * 20 AS bal0 " +
          "FROM customer WHERE c_custkey % 5 = 2)") {
        case (prev, (n, e)) => s"(SELECT *, $e AS $n FROM $prev)" }
      s"""SELECT ck, principal, rate_bp, pay, bal12,
         |  ${(0 until 12).map(k => s"i$k").mkString(" + ")} AS total_interest,
         |  principal - bal12 AS principal_paid
         |FROM $walked ORDER BY ck""".stripMargin
    },

    // Same monthly inflows, same 3× investment, same crossing pick.
    "agg_payback_period" ->
      """WITH m AS (SELECT o_orderpriority AS pri,
        |    CAST(STRFTIME(o_orderdate, '%Y%m') AS BIGINT) AS mon,
        |    CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |      AS inflow
        |  FROM orders GROUP BY 1, 2),
        |c AS (SELECT *, CAST(SUM(inflow) OVER (PARTITION BY pri
        |      ORDER BY mon ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cumin,
        |    CAST(FIRST_VALUE(inflow) OVER (PARTITION BY pri ORDER BY mon
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |      AS BIGINT) * 3 AS invest,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY pri ORDER BY mon)
        |      AS BIGINT) AS midx,
        |    CAST(COUNT(*) OVER (PARTITION BY pri) AS BIGINT) AS nmon
        |  FROM m),
        |x AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY pri ORDER BY mon)
        |    AS pick FROM c WHERE cumin >= invest)
        |SELECT pri, invest, midx,
        |  (invest - (cumin - inflow)) * 1000 // inflow AS frac_milli, nmon
        |FROM x WHERE pick = 1 ORDER BY pri""".stripMargin,

    // Same rational algebra, same sign split.
    "fn_kelly_criterion" ->
      """WITH b AS (SELECT c_custkey AS ck,
        |    c_custkey * 7919 % 500000 + 250000 AS p_ppm,
        |    c_custkey * 104729 % 3000 + 500 AS b_milli
        |  FROM customer WHERE c_custkey % 7 = 3),
        |e AS (SELECT *, 1000000 - p_ppm AS q_ppm,
        |    b_milli * p_ppm - 1000 * (1000000 - p_ppm) AS edge_num FROM b)
        |SELECT ck, p_ppm, b_milli, edge_num,
        |  CASE WHEN edge_num < 0 THEN -((-edge_num) // b_milli)
        |    ELSE edge_num // b_milli END AS kelly_ppm,
        |  GREATEST(CASE WHEN edge_num < 0 THEN -((-edge_num) // b_milli)
        |    ELSE edge_num // b_milli END, 0) AS stake_ppm
        |FROM e ORDER BY ck""".stripMargin,

    // Same branches, same ppm identities.
    "fn_odds_convert" ->
      """WITH b AS (SELECT CAST(p_partkey AS BIGINT) AS pk,
        |    CAST(p_partkey AS BIGINT) * 37 % 9000 + 1100 AS dec1,
        |    CAST(p_partkey AS BIGINT) * 53 % 9000 + 1100 AS dec2
        |  FROM part WHERE p_partkey % 13 = 1)
        |SELECT pk, dec1, dec2, dec1 - 1000 AS frac_milli,
        |  CASE WHEN dec1 >= 2000 THEN (dec1 - 1000) * 100
        |    ELSE -(100000000 // (dec1 - 1000)) END AS american_milli,
        |  1000000000 // dec1 AS implied1_ppm,
        |  1000000000 // dec1 + 1000000000 // dec2 - 1000000
        |    AS overround_ppm
        |FROM b ORDER BY pk""".stripMargin
  )
}
