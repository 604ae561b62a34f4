package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Round-11 late-wave operators. A fresh compilation unit on purpose:
  * Analytics.scala crossed 7k lines and its incremental recompile
  * dominates the per-wave loop — new ops land here so scalac touches a
  * small file. Same engine-exactness laws, same paired impl/oracle
  * discipline as every other family.
  */
object Round11Ops {
  type Q = (SparkSession, String) => DataFrame

  private def u(ns: String, id: String = "doc_id") =
    s"CAST(conv(substring(md5(concat('$ns:', CAST($id AS STRING))), 1, 8), 16, 10) AS BIGINT)"

  val queries: Map[String, Q] = Map(
    // Volume profile — WHERE the volume traded, not when (win_vwap
    // averages over time; the profile histograms over PRICE): md5
    // volumes into 100-cent price buckets, POC = the modal bucket
    // (volume desc, bucket asc — total order), and the value area as
    // the volume-ranked 70% variant (take buckets by volume rank while
    // the cumulative volume BEFORE the bucket is under 7·total/10 —
    // fully cleared, no percentage ever materializes). The rank window
    // runs over price buckets per type — bounded by the price range,
    // not by n.
    "win_volume_profile" -> ((s, d) => {
      val buckets = Tables.events(s, d)
        .select(col("event_type"),
          expr("CAST(FLOOR(value * 100) AS BIGINT) DIV 100").as("pb"),
          expr(s"${u("vpv", "event_id")} % 100 + 1").as("vol"))
        .groupBy("event_type", "pb")
        .agg(sum("vol").as("v"))
      val wRank = Window.partitionBy("event_type").orderBy(col("v").desc, col("pb"))
      buckets
        .withColumn("rk", row_number().over(wRank).cast("bigint"))
        .withColumn("cum_before", coalesce(sum("v").over(
          wRank.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .withColumn("tot", sum("v").over(Window.partitionBy("event_type")))
        .withColumn("in_va", expr("10 * cum_before < 7 * tot"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_buckets"),
          max(when(col("rk") === 1, col("pb"))).as("poc_pb"),
          sum(when(col("in_va"), 1L).otherwise(0L)).as("va_buckets"),
          sum(when(col("in_va"), col("v")).otherwise(0L)).as("va_vol"),
          max("tot").as("tot_vol"))
        .orderBy("event_type")
    }),

    // Recall@k curve — the retrieval eval beside llm_retrieval_mrr's
    // single number (capacity planning reads the CURVE: how much does
    // k=10 buy over k=5?): every 7th doc is a query with 3 planted
    // relevant candidates among 20, scores = md5 + a +300 relevance
    // bonus (so ranking is good but imperfect), per-query 20-row rank
    // window, recall@{1,5,10} macro-averaged in exact ppm; the curve
    // must be monotone by construction of nested top-k sets.
    "llm_recall_at_k" -> ((s, d) => {
      val qs = Tables.documents(s, d).where(col("doc_id") % 7 === 0)
        .select(col("doc_id").as("q"))
      val cand = qs.crossJoin(broadcast(s.range(0, 20).select(col("id").as("k"))))
        .withColumn("relevant", expr("IF(k < 3, 1, 0)"))
        .withColumn("score", expr(
          s"""CAST(conv(substring(md5(concat('rak:', CAST(q AS STRING), ':',
              CAST(k AS STRING))), 1, 8), 16, 10) AS BIGINT) % 1000 + relevant * 300"""))
        .withColumn("rk", row_number().over(
          Window.partitionBy("q").orderBy(col("score").desc, col("k"))).cast("bigint"))
      cand.agg(countDistinct("q").as("nq"),
          sum(when(col("rk") <= 1, col("relevant")).otherwise(0L)).as("hit1"),
          sum(when(col("rk") <= 5, col("relevant")).otherwise(0L)).as("hit5"),
          sum(when(col("rk") <= 10, col("relevant")).otherwise(0L)).as("hit10"))
        .withColumn("recall1_ppm", expr("hit1 * 1000000 DIV (3 * nq)"))
        .withColumn("recall5_ppm", expr("hit5 * 1000000 DIV (3 * nq)"))
        .withColumn("recall10_ppm", expr("hit10 * 1000000 DIV (3 * nq)"))
        .select("nq", "hit1", "hit5", "hit10",
          "recall1_ppm", "recall5_ppm", "recall10_ppm")
    }),

    // Dispersion index — overdispersion vs the Poisson/equi baseline
    // (count data whose variance outruns its mean breaks every Poisson
    // assumption downstream): the SAME mean-5 plant built two ways — a
    // flat uniform (D = 2, overdispersed) and a sum-of-two-dice shape
    // (D ≈ 1.17) — D = (nΣx²−Sx²)/((n−1)·Sx) exact milli, the D > 3/2
    // verdict fully cross-multiplied 2(nΣx²−Sx²) > 3(n−1)Sx.
    "agg_dispersion_index" -> ((s, d) => {
      def series(xExpr: String, label: String) =
        Tables.documents(s, d).select(col("doc_id"))
          .withColumn("x", expr(xExpr))
          .agg(count(lit(1)).as("n"), sum("x").as("sx"),
            sum(expr("x * x")).as("sxx"))
          .withColumn("series", lit(label))
      series(s"${u("dia")} % 11", "uniform")
        .unionByName(series(s"${u("dib")} % 6 + ${u("dic")} % 6", "two_dice"))
        .withColumn("d_milli", expr(
          "(n * sxx - sx * sx) * 1000 DIV ((n - 1) * sx)"))
        .withColumn("overdispersed", expr(
          "2 * (n * sxx - sx * sx) > 3 * (n - 1) * sx"))
        .select("series", "n", "sx", "d_milli", "overdispersed")
        .orderBy("series")
    })
  )

  val oracles: Map[String, String] = Map(
    // Same price buckets, same volume-ranked 70% value area.
    "win_volume_profile" ->
      """WITH e AS (SELECT event_type,
        |    CAST(FLOOR(value * 100) AS BIGINT) // 100 AS pb,
        |    ('0x' || substring(md5('vpv:' || CAST(event_id AS VARCHAR)), 1, 8))::BIGINT % 100 + 1 AS vol
        |  FROM events),
        |b AS (SELECT event_type, pb, CAST(SUM(vol) AS BIGINT) AS v
        |  FROM e GROUP BY 1, 2),
        |r AS (SELECT *, CAST(ROW_NUMBER() OVER w AS BIGINT) AS rk,
        |    COALESCE(CAST(SUM(v) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS cum_before,
        |    CAST(SUM(v) OVER (PARTITION BY event_type) AS BIGINT) AS tot
        |  FROM b WINDOW w AS (PARTITION BY event_type ORDER BY v DESC, pb))
        |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_buckets,
        |  CAST(MAX(CASE WHEN rk = 1 THEN pb END) AS BIGINT) AS poc_pb,
        |  CAST(SUM(CASE WHEN 10 * cum_before < 7 * tot THEN 1 ELSE 0 END) AS BIGINT) AS va_buckets,
        |  CAST(SUM(CASE WHEN 10 * cum_before < 7 * tot THEN v ELSE 0 END) AS BIGINT) AS va_vol,
        |  CAST(MAX(tot) AS BIGINT) AS tot_vol
        |FROM r GROUP BY 1 ORDER BY 1""".stripMargin,

    // Same 20-candidate plant, same nested top-k recall ppms.
    "llm_recall_at_k" ->
      """WITH q AS (SELECT doc_id AS q FROM documents WHERE doc_id % 7 = 0),
        |k AS (SELECT CAST(v AS BIGINT) AS k FROM generate_series(0, 19) s(v)),
        |c AS (SELECT q, k, CASE WHEN k < 3 THEN 1 ELSE 0 END AS relevant,
        |    ('0x' || substring(md5('rak:' || CAST(q AS VARCHAR) || ':' || CAST(k AS VARCHAR)), 1, 8))::BIGINT % 1000
        |      + CASE WHEN k < 3 THEN 300 ELSE 0 END AS score
        |  FROM q CROSS JOIN k),
        |r AS (SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY q
        |      ORDER BY score DESC, k) AS BIGINT) AS rk FROM c),
        |a AS (SELECT CAST(COUNT(DISTINCT q) AS BIGINT) AS nq,
        |    CAST(SUM(CASE WHEN rk <= 1 THEN relevant ELSE 0 END) AS BIGINT) AS hit1,
        |    CAST(SUM(CASE WHEN rk <= 5 THEN relevant ELSE 0 END) AS BIGINT) AS hit5,
        |    CAST(SUM(CASE WHEN rk <= 10 THEN relevant ELSE 0 END) AS BIGINT) AS hit10
        |  FROM r)
        |SELECT nq, hit1, hit5, hit10,
        |  hit1 * 1000000 // (3 * nq) AS recall1_ppm,
        |  hit5 * 1000000 // (3 * nq) AS recall5_ppm,
        |  hit10 * 1000000 // (3 * nq) AS recall10_ppm
        |FROM a""".stripMargin,

    // Same mean-5 plants, same cross-multiplied 3/2 verdict.
    "agg_dispersion_index" ->
      """WITH a AS (SELECT 'uniform' AS series,
        |    ('0x' || substring(md5('dia:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 11 AS x
        |  FROM documents
        |  UNION ALL
        |  SELECT 'two_dice',
        |    ('0x' || substring(md5('dib:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 6
        |    + ('0x' || substring(md5('dic:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 6
        |  FROM documents),
        |g AS (SELECT series, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(x * x) AS BIGINT) AS sxx
        |  FROM a GROUP BY 1)
        |SELECT series, n, sx,
        |  (n * sxx - sx * sx) * 1000 // ((n - 1) * sx) AS d_milli,
        |  2 * (n * sxx - sx * sx) > 3 * (n - 1) * sx AS overdispersed
        |FROM g ORDER BY series""".stripMargin
  )
}
