package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Round-12 operators, second compilation unit (Round12Ops.scala crossed
  * 1.6k lines; a fresh small file keeps the incremental recompile at ~1 s).
  * Same paired impl/oracle style, same engine-exactness laws.
  */
object Round12bOps {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // EXCEPT ALL — bag difference (multiplicities subtract, floor 0), the
    // third bag-algebra operator next to set_union_all/set_intersect_all.
    // Spark plans the same counted-group hash join as INTERSECT ALL; at
    // 100 TB both sides shuffle once on the value and the difference is
    // computed group-local — never a row-by-row anti probe.
    "set_except_all" -> ((s, d) => {
      val a = Tables.customer(s, d)
        .select(col("c_nationkey").cast("bigint").as("nationkey"))
      val b = Tables.supplier(s, d).where(col("s_acctbal") > 5000)
        .select(col("s_nationkey").cast("bigint").as("nationkey"))
      a.exceptAll(b)
        .groupBy("nationkey").agg(count(lit(1)).as("n_exall"))
        .orderBy("nationkey")
    }),

    // IDENTIFIER(:param) — late-bound table/column names from SQL
    // parameters WITHOUT string interpolation (the injection-safe form of
    // dynamic SQL; the constant-folded identifier still resolves at
    // analysis time, so the plan is identical to the literal query —
    // pushdown and pruning are unaffected).
    "api_identifier_clause" -> ((s, d) => {
      Tables.orders(s, d).createOrReplaceTempView("graft_ident_orders_v")
      s.sql(
        """SELECT o_orderstatus, COUNT(*) AS n_orders,
          |  CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
          |FROM IDENTIFIER(:tbl)
          |WHERE IDENTIFIER(:keycol) % :m = 0
          |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
        Map("tbl" -> "graft_ident_orders_v", "keycol" -> "o_orderkey",
          "m" -> Integer.valueOf(3)))
    }),

    // Gregorian Easter (anonymous Gauss computus) for 1901–2100 — pure
    // DIV/MOD integer chain, zero transcendentals, constant 200-row
    // domain; the classic proof that calendar logic stays in exact
    // integer arithmetic end-to-end. All intermediates are non-negative
    // so integer division needs no magnitude-then-negate guard.
    "fn_easter_computus" -> ((s, d) => {
      s.range(1901, 2101).toDF("yr")
        .withColumn("a", expr("yr % 19"))
        .withColumn("b", expr("yr DIV 100"))
        .withColumn("c", expr("yr % 100"))
        .withColumn("dd", expr("b DIV 4"))
        .withColumn("e", expr("b % 4"))
        .withColumn("f", expr("(b + 8) DIV 25"))
        .withColumn("g", expr("(b - f + 1) DIV 3"))
        .withColumn("h", expr("(19*a + b - dd - g + 15) % 30"))
        .withColumn("i", expr("c DIV 4"))
        .withColumn("k", expr("c % 4"))
        .withColumn("l", expr("(32 + 2*e + 2*i - h - k) % 7"))
        .withColumn("m", expr("(a + 11*h + 22*l) DIV 451"))
        .withColumn("em", expr("(h + l - 7*m + 114) DIV 31"))
        .withColumn("ed", expr("(h + l - 7*m + 114) % 31 + 1"))
        .select(col("yr"),
          col("em").cast("bigint").as("easter_month"),
          col("ed").cast("bigint").as("easter_day"),
          expr("CAST(make_date(CAST(yr AS INT), CAST(em AS INT), CAST(ed AS INT)) AS STRING)").as("easter_date"))
        .orderBy("yr")
    }),

    // Business-day (Mon–Fri) order-to-ship lead time per lineitem,
    // CLOSED FORM from epoch days — no per-day explode, no calendar join:
    // g(e) = weekdays in [1970-01-01, day e) = 5·(e DIV 7) + r(e MOD 7)
    // with r the 7-entry literal prefix table anchored on day 0 =
    // Thursday; bdays(order, ship] = g(e_ship+1) − g(e_order+1). O(1) per
    // row, scan-local, aggregates map-side — the shape that survives a
    // 100 TB lineitem. avg in exact milli (nonneg → DIV safe).
    "fn_business_days" -> ((s, d) => {
      Tables.lineitem(s, d)
        .join(Tables.orders(s, d),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("o_orderpriority"),
          datediff(col("l_shipdate"), to_date(lit("1970-01-01")))
            .cast("bigint").as("er"),
          datediff(col("o_orderdate"), to_date(lit("1970-01-01")))
            .cast("bigint").as("es"))
        .withColumn("gr", expr(
          "5 * ((er + 1) DIV 7) + element_at(array(0,1,2,2,2,3,4), CAST((er + 1) % 7 AS INT) + 1)"))
        .withColumn("gs", expr(
          "5 * ((es + 1) DIV 7) + element_at(array(0,1,2,2,2,3,4), CAST((es + 1) % 7 AS INT) + 1)"))
        .withColumn("bd", col("gr") - col("gs"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_items"),
          sum("bd").as("total_bdays"),
          expr("SUM(bd) * 1000 DIV COUNT(*)").as("avg_bdays_milli"))
        .orderBy("o_orderpriority")
    }),

    // Williams %R (10-period) with overbought/oversold zone classification
    // and zone-transition counts — the momentum-oscillator twin of
    // win_stochastic_osc but inverted scale, shorter window, and a zone
    // state machine on top: %R magnitude ppm = (h10 − close)·10⁶ DIV
    // (h10 − l10); OB < 200000 (price near high), OS > 800000. One
    // shuffle (partition by series), two window passes on the same sort.
    "win_williams_r" -> ((s, d) => {
      val ord = Window.partitionBy("event_type")
        .orderBy(col("ts_us"), col("event_id"))
      val w10 = ord.rowsBetween(-9, 0)
      Tables.events(s, d)
        .select(col("event_type"), col("event_id"), col("ts_us"),
          floor(col("value") * 100).cast("bigint").as("cents"))
        .withColumn("rn", row_number().over(ord).cast("bigint"))
        .withColumn("h10", max("cents").over(w10))
        .withColumn("l10", min("cents").over(w10))
        .withColumn("wr_ppm", expr(
          "CASE WHEN h10 > l10 THEN (h10 - cents) * 1000000 DIV (h10 - l10) ELSE 500000 END"))
        .withColumn("zone", expr(
          "CASE WHEN wr_ppm < 200000 THEN 'OB' WHEN wr_ppm > 800000 THEN 'OS' ELSE 'MID' END"))
        .withColumn("prev_zone", lag("zone", 1).over(ord))
        .where(col("rn") >= 10)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_obs"),
          sum(expr("CASE WHEN zone = 'OB' THEN 1 ELSE 0 END")).as("n_ob"),
          sum(expr("CASE WHEN zone = 'OS' THEN 1 ELSE 0 END")).as("n_os"),
          sum(expr("CASE WHEN prev_zone IS NOT NULL AND zone <> prev_zone THEN 1 ELSE 0 END"))
            .as("n_transitions"))
        .orderBy("event_type")
    })
  )

  val oracles: Map[String, String] = Map(
    // Same bag difference, same counted-group contract.
    "set_except_all" ->
      """SELECT nationkey, COUNT(*) AS n_exall FROM (
        |  SELECT CAST(c_nationkey AS BIGINT) AS nationkey FROM customer
        |  EXCEPT ALL
        |  SELECT CAST(s_nationkey AS BIGINT) FROM supplier WHERE s_acctbal > 5000)
        |GROUP BY nationkey ORDER BY nationkey""".stripMargin,

    // The identifier binds to the literal table/column — replay directly.
    "api_identifier_clause" ->
      """SELECT o_orderstatus, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
        |FROM orders WHERE o_orderkey % 3 = 0
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    // Identical integer computus chain (// = DuckDB integer division;
    // every intermediate non-negative).
    "fn_easter_computus" ->
      """WITH y AS (SELECT CAST(g AS BIGINT) AS yr
        |  FROM generate_series(1901, 2100) t(g)),
        |c AS (SELECT yr, yr % 19 AS a, yr // 100 AS b, yr % 100 AS c FROM y),
        |c2 AS (SELECT *, b // 4 AS dd, b % 4 AS e, (b + 8) // 25 AS f,
        |    (b - (b + 8) // 25 + 1) // 3 AS g FROM c),
        |c3 AS (SELECT *, (19*a + b - dd - g + 15) % 30 AS h,
        |    c // 4 AS i, c % 4 AS k FROM c2),
        |c4 AS (SELECT *, (32 + 2*e + 2*i - h - k) % 7 AS l FROM c3),
        |c5 AS (SELECT *, (a + 11*h + 22*l) // 451 AS m FROM c4)
        |SELECT yr,
        |  CAST((h + l - 7*m + 114) // 31 AS BIGINT) AS easter_month,
        |  CAST((h + l - 7*m + 114) % 31 + 1 AS BIGINT) AS easter_day,
        |  CAST(make_date(CAST(yr AS INT), CAST((h + l - 7*m + 114) // 31 AS INT),
        |    CAST((h + l - 7*m + 114) % 31 + 1 AS INT)) AS VARCHAR) AS easter_date
        |FROM c5 ORDER BY yr""".stripMargin,

    // Same closed-form weekday prefix count (day 0 = Thursday; DuckDB
    // date subtraction yields integer days; list indexing is 1-based).
    "fn_business_days" ->
      """WITH e AS (SELECT o_orderpriority,
        |    CAST(date_diff('day', DATE '1970-01-01', l_shipdate) AS BIGINT) AS er,
        |    CAST(date_diff('day', DATE '1970-01-01', o_orderdate) AS BIGINT) AS es
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |g AS (SELECT o_orderpriority,
        |    (5 * ((er + 1) // 7) + ([0,1,2,2,2,3,4])[CAST((er + 1) % 7 AS INT) + 1])
        |  - (5 * ((es + 1) // 7) + ([0,1,2,2,2,3,4])[CAST((es + 1) % 7 AS INT) + 1])
        |    AS bd
        |  FROM e)
        |SELECT o_orderpriority, COUNT(*) AS n_items,
        |  CAST(SUM(bd) AS BIGINT) AS total_bdays,
        |  CAST(CAST(SUM(bd) AS BIGINT) * 1000 // COUNT(*) AS BIGINT) AS avg_bdays_milli
        |FROM g GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    // Same 10-period extremes, same zone thresholds, same lag transition
    // count.
    "win_williams_r" ->
      """WITH e AS (SELECT event_type, event_id, epoch_us(ts) AS ts_us,
        |    CAST(FLOOR(value * 100) AS BIGINT) AS cents FROM events),
        |w AS (SELECT event_type, event_id, ts_us, cents,
        |    CAST(ROW_NUMBER() OVER ord AS BIGINT) AS rn,
        |    CAST(MAX(cents) OVER w10 AS BIGINT) AS h10,
        |    CAST(MIN(cents) OVER w10 AS BIGINT) AS l10
        |  FROM e
        |  WINDOW ord AS (PARTITION BY event_type ORDER BY ts_us, event_id),
        |    w10 AS (PARTITION BY event_type ORDER BY ts_us, event_id
        |      ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)),
        |z AS (SELECT *,
        |    CASE WHEN h10 > l10 THEN (h10 - cents) * 1000000 // (h10 - l10)
        |      ELSE 500000 END AS wr_ppm
        |  FROM w),
        |zz AS (SELECT *,
        |    CASE WHEN wr_ppm < 200000 THEN 'OB'
        |      WHEN wr_ppm > 800000 THEN 'OS' ELSE 'MID' END AS zone
        |  FROM z),
        |zl AS (SELECT *, LAG(zone) OVER (PARTITION BY event_type
        |    ORDER BY ts_us, event_id) AS prev_zone FROM zz)
        |SELECT event_type, COUNT(*) AS n_obs,
        |  CAST(SUM(CASE WHEN zone = 'OB' THEN 1 ELSE 0 END) AS BIGINT) AS n_ob,
        |  CAST(SUM(CASE WHEN zone = 'OS' THEN 1 ELSE 0 END) AS BIGINT) AS n_os,
        |  CAST(SUM(CASE WHEN prev_zone IS NOT NULL AND zone <> prev_zone
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_transitions
        |FROM zl WHERE rn >= 10
        |GROUP BY event_type ORDER BY event_type""".stripMargin
  )
}
