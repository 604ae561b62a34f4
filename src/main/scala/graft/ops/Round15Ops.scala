package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Round-15 operators — same paired impl/oracle style and engine-exactness
  * laws as the Round12–Round14 units: exact integer/DECIMAL(38,0) arithmetic
  * for graded values, floor division (`DIV` / `//`) on both sides, DuckDB
  * twins via HUGEINT.
  *
  * Wave 1 opens with the round-14 verdict's top item: EM-estimated
  * Fellegi–Sunter m/u weights — the unsupervised parameter-learning step
  * (Splink-style) the identity stack's scoring layer lacked.
  */
object Round15Ops {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // EM-estimated Fellegi–Sunter m/u weights — join_fellegi_sunter scores
    // with DECLARED constants; every real linkage deployment learns the
    // per-field m (P(agree|match)) and u (P(agree|unmatch)) probabilities
    // unsupervised via EM over agreement-pattern counts. Fixture: the same
    // blocked master×dirty roster as join_fellegi_sunter (blocks of ~10
    // keys → ~10% of blocked pairs are true matches) with RECOVERABLE
    // planted rates — name drifts for k%21==8 (m_name = 20/21), city for
    // k%15==2 (m_city = 14/15), yob for k%9==5 (m_yob = 8/9); non-match
    // agreement is ~0 (name), ~1/25 (city), small (yob). Three unrolled EM
    // iterations run entirely in exact ppm integers: the E-step
    // responsibility r = π·∏m / (π·∏m + (1−π)·∏u) as a DECIMAL(38,0)/
    // HUGEINT cross-multiplied floor division, the M-step re-estimates
    // (π, m, u) from responsibility-weighted pattern counts — all over the
    // EIGHT-row agreement-pattern census, so the data-scaled work is ONE
    // blocked join + rollup and the EM itself is O(2^fields) metadata at
    // any corpus size. Graded: the final per-pattern responsibilities, the
    // link/possible/non-link census they induce (0.9/0.1 thresholds), and
    // the learned parameters themselves. Round15Wave1Spec asserts the EM
    // recovers the planted drift rates.
    "join_fs_em_weights" -> ((s, d) => {
      val base = Tables.customer(s, d)
        .select(col("c_custkey").cast("bigint").as("k"),
          col("c_nationkey").cast("bigint").as("city0"))
        .withColumn("name",
          concat(lit("cust_"), lpad(col("k").cast("string"), 7, "0")))
        .withColumn("yob0", lit(1950L) + col("k") % 50)
        .withColumn("block", substring(col("name"), 1, 11))
      val m = base.select(col("k").as("mk"), col("name").as("mname"),
        col("city0").as("mcity"), col("yob0").as("myob"), col("block"))
      // dirty-side drift lands in the LAST name char so the block key
      // (first 11 chars) survives and the matched pair still meets
      val dd = base.select(col("k").as("dk"),
        when(col("k") % 21 === 8, concat(col("block"), lit("X")))
          .otherwise(col("name")).as("dname"),
        when(col("k") % 15 === 2, (col("city0") + 1) % 25)
          .otherwise(col("city0")).as("dcity"),
        when(col("k") % 9 === 5, col("yob0") + 1)
          .otherwise(col("yob0")).as("dyob"),
        col("block"))
      val pat = dd.join(m, Seq("block"))
        .select((col("dname") === col("mname")).as("gn"),
          (col("dcity") === col("mcity")).as("gc"),
          (col("dyob") === col("myob")).as("gy"))
        .groupBy("gn", "gc", "gy").agg(count(lit(1)).as("cnt"))
        .localCheckpoint() // ≤8 rows; four E-steps fold over it
      // E-step: responsibility per pattern from the CURRENT params (one
      // broadcast 1-row param table; products ≤ 10²⁴ in DECIMAL(38,0))
      def estep(params: DataFrame): DataFrame =
        pat.crossJoin(broadcast(params))
          .withColumn("num", expr(
            """CAST(pi AS DECIMAL(38,0))
              | * (CASE WHEN gn THEN mn ELSE 1000000 - mn END)
              | * (CASE WHEN gc THEN mc ELSE 1000000 - mc END)
              | * (CASE WHEN gy THEN my ELSE 1000000 - my END)""".stripMargin))
          .withColumn("den", expr(
            """CAST(1000000 - pi AS DECIMAL(38,0))
              | * (CASE WHEN gn THEN un ELSE 1000000 - un END)
              | * (CASE WHEN gc THEN uc ELSE 1000000 - uc END)
              | * (CASE WHEN gy THEN uy ELSE 1000000 - uy END)""".stripMargin))
          .withColumn("r", expr(
            "CAST((num * 1000000) DIV (num + den) AS BIGINT)"))
      // M-step: responsibility-weighted re-estimates (all sums ≤ 1.5·10¹⁷
      // — plain BIGINT floor divisions, HUGEINT-cast on the oracle side)
      def mstep(e: DataFrame): DataFrame =
        e.agg(sum(expr("cnt * r")).as("sr"), sum("cnt").as("n"),
            sum(expr("CASE WHEN gn THEN cnt * r ELSE 0 END")).as("srn"),
            sum(expr("CASE WHEN gc THEN cnt * r ELSE 0 END")).as("src"),
            sum(expr("CASE WHEN gy THEN cnt * r ELSE 0 END")).as("sry"),
            sum(expr("cnt * (1000000 - r)")).as("sq"),
            sum(expr("CASE WHEN gn THEN cnt * (1000000 - r) ELSE 0 END")).as("sqn"),
            sum(expr("CASE WHEN gc THEN cnt * (1000000 - r) ELSE 0 END")).as("sqc"),
            sum(expr("CASE WHEN gy THEN cnt * (1000000 - r) ELSE 0 END")).as("sqy"))
          .select(expr("sr DIV n").as("pi"),
            expr("(srn * 1000000) DIV sr").as("mn"),
            expr("(src * 1000000) DIV sr").as("mc"),
            expr("(sry * 1000000) DIV sr").as("my"),
            expr("(sqn * 1000000) DIV sq").as("un"),
            expr("(sqc * 1000000) DIV sq").as("uc"),
            expr("(sqy * 1000000) DIV sq").as("uy"))
      val init = s.range(1).select(lit(500000L).as("pi"),
        lit(800000L).as("mn"), lit(800000L).as("mc"), lit(800000L).as("my"),
        lit(200000L).as("un"), lit(200000L).as("uc"), lit(200000L).as("uy"))
      val p3 = mstep(estep(mstep(estep(mstep(estep(init))))))
      val fin = estep(p3).localCheckpoint() // final responsibilities + p3 cols
      val patterns = fin.select(lit("pattern").as("kind"),
        concat(when(col("gn"), "1").otherwise("0"),
          when(col("gc"), "1").otherwise("0"),
          when(col("gy"), "1").otherwise("0")).as("key"),
        col("cnt").as("n_pairs"), col("r").as("value_ppm"))
      val classes = fin
        .withColumn("cls", when(col("r") >= 900000L, "link")
          .when(col("r") >= 100000L, "possible").otherwise("non_link"))
        .groupBy("cls").agg(sum("cnt").as("n_pairs"))
        .select(lit("class").as("kind"), col("cls").as("key"),
          col("n_pairs"), lit(null).cast("long").as("value_ppm"))
      val params = fin.limit(1).select(expr(
          """stack(7, 'pi', pi, 'm_name', mn, 'm_city', mc, 'm_yob', my,
            | 'u_name', un, 'u_city', uc, 'u_yob', uy)
            | AS (key, value_ppm)""".stripMargin))
        .select(lit("param").as("kind"), col("key"),
          lit(null).cast("long").as("n_pairs"), col("value_ppm"))
      patterns.unionByName(classes).unionByName(params)
        .orderBy("kind", "key")
    })
  )

  /** Shared DuckDB SQL for the FS EM fixture's blocked pattern census. */
  private val fsEmPatternsSql: String =
    """base AS (
      |  SELECT CAST(c_custkey AS BIGINT) AS k,
      |    CAST(c_nationkey AS BIGINT) AS city0,
      |    'cust_' || lpad(CAST(c_custkey AS VARCHAR), 7, '0') AS name,
      |    1950 + CAST(c_custkey AS BIGINT) % 50 AS yob0
      |  FROM customer),
      |m AS (SELECT k AS mk, name AS mname, city0 AS mcity, yob0 AS myob,
      |    substring(name, 1, 11) AS block FROM base),
      |dd AS (
      |  SELECT k AS dk,
      |    CASE WHEN k % 21 = 8 THEN substring(name, 1, 11) || 'X' ELSE name END AS dname,
      |    CASE WHEN k % 15 = 2 THEN (city0 + 1) % 25 ELSE city0 END AS dcity,
      |    CASE WHEN k % 9 = 5 THEN yob0 + 1 ELSE yob0 END AS dyob,
      |    substring(name, 1, 11) AS block
      |  FROM base),
      |pat AS (
      |  SELECT dname = mname AS gn, dcity = mcity AS gc, dyob = myob AS gy,
      |    CAST(COUNT(*) AS BIGINT) AS cnt
      |  FROM dd JOIN m ON dd.block = m.block GROUP BY 1, 2, 3)""".stripMargin

  /** One EM E-step in DuckDB: responsibilities from the params CTE `p`. */
  private def fsEmEstepSql(out: String, p: String): String =
    s"""$out AS (
       |  SELECT gn, gc, gy, cnt,
       |    CAST((num * 1000000) // (num + den) AS BIGINT) AS r
       |  FROM (
       |    SELECT gn, gc, gy, cnt,
       |      CAST(pi AS HUGEINT)
       |        * (CASE WHEN gn THEN mn ELSE 1000000 - mn END)
       |        * (CASE WHEN gc THEN mc ELSE 1000000 - mc END)
       |        * (CASE WHEN gy THEN my ELSE 1000000 - my END) AS num,
       |      CAST(1000000 - pi AS HUGEINT)
       |        * (CASE WHEN gn THEN un ELSE 1000000 - un END)
       |        * (CASE WHEN gc THEN uc ELSE 1000000 - uc END)
       |        * (CASE WHEN gy THEN uy ELSE 1000000 - uy END) AS den
       |    FROM pat CROSS JOIN $p) q)""".stripMargin

  /** One EM M-step in DuckDB: params from the responsibilities CTE `e`. */
  private def fsEmMstepSql(out: String, e: String): String =
    s"""$out AS (
       |  SELECT CAST(SUM(cnt * r) // SUM(cnt) AS BIGINT) AS pi,
       |    CAST((SUM(CASE WHEN gn THEN cnt * r ELSE 0 END) * 1000000)
       |      // SUM(cnt * r) AS BIGINT) AS mn,
       |    CAST((SUM(CASE WHEN gc THEN cnt * r ELSE 0 END) * 1000000)
       |      // SUM(cnt * r) AS BIGINT) AS mc,
       |    CAST((SUM(CASE WHEN gy THEN cnt * r ELSE 0 END) * 1000000)
       |      // SUM(cnt * r) AS BIGINT) AS my,
       |    CAST((SUM(CASE WHEN gn THEN cnt * (1000000 - r) ELSE 0 END) * 1000000)
       |      // SUM(cnt * (1000000 - r)) AS BIGINT) AS un,
       |    CAST((SUM(CASE WHEN gc THEN cnt * (1000000 - r) ELSE 0 END) * 1000000)
       |      // SUM(cnt * (1000000 - r)) AS BIGINT) AS uc,
       |    CAST((SUM(CASE WHEN gy THEN cnt * (1000000 - r) ELSE 0 END) * 1000000)
       |      // SUM(cnt * (1000000 - r)) AS BIGINT) AS uy
       |  FROM $e)""".stripMargin

  val oracles: Map[String, String] = Map(
    "join_fs_em_weights" -> {
      val init = """p0 AS (SELECT CAST(500000 AS BIGINT) AS pi,
                   |  CAST(800000 AS BIGINT) AS mn, CAST(800000 AS BIGINT) AS mc,
                   |  CAST(800000 AS BIGINT) AS my, CAST(200000 AS BIGINT) AS un,
                   |  CAST(200000 AS BIGINT) AS uc, CAST(200000 AS BIGINT) AS uy)""".stripMargin
      s"""WITH $fsEmPatternsSql,
         |$init,
         |${fsEmEstepSql("e1", "p0")},
         |${fsEmMstepSql("p1", "e1")},
         |${fsEmEstepSql("e2", "p1")},
         |${fsEmMstepSql("p2", "e2")},
         |${fsEmEstepSql("e3", "p2")},
         |${fsEmMstepSql("p3", "e3")},
         |${fsEmEstepSql("e4", "p3")}
         |SELECT kind, key, n_pairs, value_ppm FROM (
         |  SELECT 'pattern' AS kind,
         |    (CASE WHEN gn THEN '1' ELSE '0' END)
         |      || (CASE WHEN gc THEN '1' ELSE '0' END)
         |      || (CASE WHEN gy THEN '1' ELSE '0' END) AS key,
         |    cnt AS n_pairs, r AS value_ppm
         |  FROM e4
         |  UNION ALL
         |  SELECT 'class' AS kind,
         |    CASE WHEN r >= 900000 THEN 'link'
         |      WHEN r >= 100000 THEN 'possible' ELSE 'non_link' END AS key,
         |    CAST(SUM(cnt) AS BIGINT) AS n_pairs, CAST(NULL AS BIGINT) AS value_ppm
         |  FROM e4 GROUP BY 2
         |  UNION ALL
         |  SELECT 'param' AS kind, u.key AS key,
         |    CAST(NULL AS BIGINT) AS n_pairs, u.value_ppm AS value_ppm
         |  FROM p3, LATERAL (VALUES
         |    ('pi', pi), ('m_name', mn), ('m_city', mc), ('m_yob', my),
         |    ('u_name', un), ('u_city', uc), ('u_yob', uy)) AS u(key, value_ppm)
         |) ORDER BY kind, key""".stripMargin
    }
  )
}
