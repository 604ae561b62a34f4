package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Round-16 operators — same paired impl/oracle style and engine-exactness
  * laws as the Round12–Round15 units: exact integer/DECIMAL(38,0) arithmetic
  * for graded values, floor division (`DIV` / `//`) on both sides of
  * non-negative numerators only, DuckDB twins via HUGEINT.
  *
  * Wave 1 closes the round-15 verdict's top item: the DELETE/compact leg of
  * the persisted ANN index lifecycle (build/serve/maintain existed, erasure
  * did not), plus the two interval/shrinkage estimators the CTR family
  * lacked (Wilson score bounds, James–Stein).
  */
object Round16Ops {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // ANN index DELETE + threshold compaction — the GDPR-erasure leg that
    // completes the persisted IVF lifecycle (build: llm_ann_ivf_pq, serve:
    // llm_ann_filtered, maintain: llm_ann_index_maintain). A 1-in-7
    // erasure batch (vec_id % 7 = 3) lands against an index that was built
    // BEFORE the requests arrived (centroids sampled and ALL vectors
    // assigned pre-erasure, index persisted to parquet). Three phases,
    // graded against brute-force truth over the SURVIVORS only:
    // 'unmasked' serves the stale files as-is — erased vectors leak into
    // the top-3 (the spec asserts the leak is nonzero: the grade is not
    // vacuous); 'masked' applies the tombstone flag at query time (files
    // unchanged — the cheap O(1) erasure a serving layer does first);
    // 'compacted' physically rewrites the index without tombstones once
    // the tombstone fraction crosses the 10% threshold (1/7 ≈ 14.3%
    // triggers it) and must return EXACTLY the masked answers — masking ≡
    // compaction is the lifecycle law under grade, plus the size census
    // (rows drop to the survivor count, tombstones to 0). All dots are the
    // native codegen'd graft_ldot over floor(x·10⁴) BIGINTs; search work
    // is probes × 4 cells, only the index build and the recall baseline
    // scan the corpus — the IVF law at any scale.
    "llm_ann_index_delete" -> ((s, d) => {
      org.apache.spark.sql.graftbridge.GraftBridge.registerFunction(s,
        "graft_ldot", exprs =>
          org.apache.spark.sql.graftbridge.LongDotProduct(exprs(0), exprs(1)))
      def dot(a: String, b: String) = s"graft_ldot($a, $b)"
      val vecs = Tables.embeddings(s, d).select(col("vec_id"),
        expr("transform(embedding, x -> CAST(FLOOR(CAST(x AS DOUBLE) * 10000) AS BIGINT))")
          .as("xs")).localCheckpoint()
      val surv = vecs.where(col("vec_id") % 7 =!= 3)
      val sizes = vecs.agg(count(lit(1)).as("t"),
        sum(when(col("vec_id") % 7 === 3, 1L).otherwise(0L)).as("del")).head()
      val nTotal = sizes.getLong(0)
      val nDeleted = sizes.getLong(1)
      val mod = math.max(1L, math.sqrt(nTotal.toDouble).toLong)
      val cent = broadcast(vecs.where(expr(
        s"CAST(conv(substring(md5(CAST(vec_id AS STRING)), 1, 8), 16, 10) AS BIGINT) % $mod = 0"))
        .select(col("vec_id").as("cid"), col("xs").as("cs")))
      // the index predates the erasure: EVERY vector assigned, then the
      // tombstone batch lands as a flag column — files are the lifecycle
      val idxDir = Scratch.opDir("ann_idx_del_v1", d)
      vecs.crossJoin(cent)
        .select(col("vec_id"), col("cid"), expr(dot("xs", "cs")).as("dt"))
        .groupBy("vec_id")
        .agg(max_by(col("cid"), struct(col("dt"), -col("cid"))).as("cluster"))
        .withColumn("deleted", col("vec_id") % 7 === 3)
        .write.mode("overwrite").parquet(idxDir)
      val idx1 = s.read.parquet(idxDir)
      // threshold-triggered compaction: physical rewrite only when the
      // tombstone fraction crosses 10% (it does: 1/7); otherwise the
      // masked index keeps serving
      val cmpDir = Scratch.opDir("ann_idx_del_v2", d)
      val compacted =
        if (nDeleted * 10L > nTotal) {
          idx1.where(!col("deleted")).drop("deleted")
            .withColumn("deleted", lit(false))
            .write.mode("overwrite").parquet(cmpDir)
          s.read.parquet(cmpDir)
        } else idx1
      // erased people cannot be probes; fixed-k md5 sample of survivors
      val probes = surv
        .orderBy(md5(concat(lit("dprobe:"), col("vec_id").cast("string"))), col("vec_id"))
        .limit(200)
        .select(col("vec_id").as("probe_id"), col("xs").as("ps"))
        .localCheckpoint()
      val wT = Window.partitionBy("probe_id").orderBy(desc("qdot"), col("vec_id"))
      val truth = surv.crossJoin(broadcast(probes))
        .where(col("vec_id") =!= col("probe_id"))
        .select(col("probe_id"), col("vec_id"), expr(dot("ps", "xs")).as("qdot"))
        .withColumn("rk", row_number().over(wT)).where(col("rk") <= 3)
        .select(col("probe_id"), col("vec_id"))
        .localCheckpoint()
      val nTruth = broadcast(truth.agg(count(lit(1)).as("n_truth")))
      val wP = Window.partitionBy("probe_id").orderBy(desc("dt"), col("cid"))
      val cells = probes.crossJoin(cent)
        .select(col("probe_id"), col("cid"), expr(dot("ps", "cs")).as("dt"))
        .withColumn("rn", row_number().over(wP)).where(col("rn") <= 4)
        .select(col("probe_id"), col("cid").as("cluster"))
        .localCheckpoint()
      def serveScored(idx: DataFrame): DataFrame =
        cells.join(idx, Seq("cluster"))
          .where(col("vec_id") =!= col("probe_id"))
          .select("probe_id", "vec_id").distinct()
          .join(broadcast(probes), "probe_id")
          .join(vecs, "vec_id")
          .select(col("probe_id"), col("vec_id"), expr(dot("ps", "xs")).as("qdot"))
      def grade(name: String, scored: DataFrame, census: DataFrame): DataFrame = {
        val returned = scored
          .withColumn("rk", row_number().over(wT)).where(col("rk") <= 3)
          .select(col("probe_id"), col("vec_id"))
        returned
          .agg(count(lit(1)).as("n_returned"),
            sum(when(col("vec_id") % 7 === 3, 1L).otherwise(0L))
              .as("n_returned_deleted"))
          .crossJoin(broadcast(
            returned.join(truth, Seq("probe_id", "vec_id"), "left_semi")
              .agg(count(lit(1)).as("hits"))))
          .crossJoin(nTruth).crossJoin(census)
          .select(lit(name).as("phase"), col("n_index_rows"),
            col("n_tombstones"), col("n_returned"), col("n_returned_deleted"),
            col("n_truth"), col("hits"),
            expr("(hits * 1000000) DIV n_truth").as("recall_ppm"))
      }
      def census(idx: DataFrame): DataFrame =
        broadcast(idx.agg(count(lit(1)).as("n_index_rows"),
          sum(when(col("deleted"), 1L).otherwise(0L)).as("n_tombstones")))
      // unmasked and masked share ONE serve pass over the v1 files: the
      // masked candidate set is exactly the unmasked one minus tombstones
      val scored1 = serveScored(idx1).localCheckpoint()
      grade("unmasked", scored1, census(idx1))
        .unionByName(grade("masked",
          scored1.where(col("vec_id") % 7 =!= 3), census(idx1)))
        .unionByName(grade("compacted", serveScored(compacted), census(compacted)))
        .orderBy("phase")
    }),

    // Wilson score interval — the CTR lower bound a ranker actually
    // serves (agg_laplace_ctr smooths the point estimate; Wilson bounds
    // it): z = 1.96 exactly, so z² = 38416/10⁴ and every term clears the
    // denominators as integers — s = isqrt(10⁴·c·(n−c) DIV n + 9604),
    // bound = (10⁴c + 19208 ∓ 196·s)·10⁶ DIV (10⁴n + 38416). Both bounds
    // provably stay in [0, 10⁶] ((√u − 98)² ≥ 0 at either edge), and
    // lower ≤ raw ≤ upper is graded per item (n_coverage_ok must equal
    // n_items — asserted in the wave spec). Native codegen'd IntSqrt does
    // the root; the oracle mirrors with CASE-corrected FLOOR(SQRT).
    // Linear projection + rollup.
    "agg_wilson_ci" -> ((s, d) => {
      org.apache.spark.sql.graftbridge.GraftBridge.registerFunction(s,
        "isqrt", exprs => org.apache.spark.sql.graftbridge.IntSqrt(exprs(0)))
      Tables.part(s, d)
        .select(col("p_partkey").cast("bigint").as("k"))
        .withColumn("cohort", (col("k") % 3).cast("int"))
        .withColumn("views", expr(
          "CAST(conv(substring(md5(concat('wv:', CAST(k AS STRING))), 1, 6), 16, 10) AS BIGINT) % 100"))
        .where(col("views") > 0)
        .withColumn("clicks", expr(
          "CAST(conv(substring(md5(concat('wc:', CAST(k AS STRING))), 1, 6), 16, 10) AS BIGINT) % (views + 1)"))
        .withColumn("raw_ppm", expr("(clicks * 1000000) DIV views"))
        .withColumn("srt", expr(
          "isqrt((10000 * clicks * (views - clicks)) DIV views + 9604)"))
        .withColumn("lower_ppm", expr(
          "((10000 * clicks + 19208 - 196 * srt) * 1000000) DIV (10000 * views + 38416)"))
        .withColumn("upper_ppm", expr(
          "((10000 * clicks + 19208 + 196 * srt) * 1000000) DIV (10000 * views + 38416)"))
        .groupBy("cohort")
        .agg(count(lit(1)).as("n_items"),
          sum("lower_ppm").as("lower_mass_ppm"),
          sum("upper_ppm").as("upper_mass_ppm"),
          sum(when(col("lower_ppm") <= col("raw_ppm") &&
            col("raw_ppm") <= col("upper_ppm"), 1L).otherwise(0L))
            .as("n_coverage_ok"),
          sum(when(col("lower_ppm") > 0L, 1L).otherwise(0L)).as("n_lower_pos"))
        .orderBy("cohort")
    }),

    // James–Stein shrinkage — the estimator that DOMINATES the raw
    // per-item mean whenever ≥4 items share a known noise scale (the
    // ranking/forecasting ensemble case): one noisy observation per
    // customer, x = θ + u with θ planted by cohort (5000/5200/5400) and
    // u = md5 % 199 − 99 uniform, so σ² = 99·100/3 = 3300 EXACTLY (the
    // known-variance Stein setup). Shrink factor B = 1 − (k−3)σ²/S with
    // S = Σ(xᵢ−x̄)² in exact milli/micro integers ((k−3)·σ²·10¹² rides in
    // DECIMAL(38,0)/HUGEINT); the estimate applies B through the
    // offset-shifted non-negative division js = x̄ − 10·B + (B·(dev +
    // 10⁷)) DIV 10⁶ — identical floors both engines, no signed DIV.
    // Graded per cohort + total: SSE of raw vs JS against the PLANTED θ;
    // the wave spec asserts Stein dominance (total js_sse < raw_sse).
    "agg_james_stein" -> ((s, d) => {
      val base = Tables.customer(s, d)
        .select(col("c_custkey").cast("bigint").as("k"))
        .withColumn("cohort", (col("k") % 3).cast("int"))
        .withColumn("theta", lit(5000L) + col("k") % 3 * 200L)
        .withColumn("x", col("theta") + expr(
          "CAST(conv(substring(md5(concat('js:', CAST(k AS STRING))), 1, 6), 16, 10) AS BIGINT) % 199") - 99L)
      val g = base.agg(count(lit(1)).as("kc"), sum("x").as("sx"))
        .withColumn("xbar_milli", expr("(sx * 1000) DIV kc"))
      val dev = base.crossJoin(broadcast(g))
        .withColumn("dev_milli", col("x") * 1000L - col("xbar_milli"))
      val shrink = broadcast(dev
        .agg(sum(expr("dev_milli * dev_milli")).as("s_micro"),
          first("kc").as("kc2"))
        .withColumn("b_shrink_ppm", expr(
          """1000000 - LEAST(CAST(1000000 AS DECIMAL(38,0)),
            | (CAST(kc2 - 3 AS DECIMAL(38,0)) * 3300 * 1000000000000)
            |   DIV s_micro)""".stripMargin).cast("bigint"))
        .select("b_shrink_ppm"))
      val scored = dev.crossJoin(shrink)
        .withColumn("js_milli", expr(
          "xbar_milli - 10 * b_shrink_ppm + (b_shrink_ppm * (dev_milli + 10000000)) DIV 1000000"))
        .withColumn("raw_err", (col("x") - col("theta")) * 1000L)
        .withColumn("js_err", col("js_milli") - col("theta") * 1000L)
      val per = scored.groupBy("cohort")
        .agg(count(lit(1)).as("n_items"),
          first("b_shrink_ppm").as("b_shrink_ppm"),
          sum(expr("raw_err * raw_err")).as("raw_sse"),
          sum(expr("js_err * js_err")).as("js_sse"))
      val tot = scored.groupBy()
        .agg(count(lit(1)).as("n_items"),
          first("b_shrink_ppm").as("b_shrink_ppm"),
          sum(expr("raw_err * raw_err")).as("raw_sse"),
          sum(expr("js_err * js_err")).as("js_sse"))
        .select(lit(-1).cast("int").as("cohort"), col("n_items"),
          col("b_shrink_ppm"), col("raw_sse"), col("js_sse"))
      per.unionByName(tot).orderBy("cohort")
    })
  )

  val oracles: Map[String, String] = Map(
    "llm_ann_index_delete" ->
      """WITH pos AS (SELECT CAST(i AS BIGINT) AS pos FROM generate_series(0, 63) AS t(i)),
        |raw AS (
        |  SELECT e.vec_id, p.pos,
        |    CAST(FLOOR(CAST(e.embedding[p.pos + 1] AS DOUBLE) * 10000) AS BIGINT) AS xm
        |  FROM embeddings e, pos p
        |  WHERE p.pos + 1 <= len(e.embedding)),
        |szs AS (SELECT COUNT(DISTINCT vec_id) AS t,
        |    COUNT(DISTINCT CASE WHEN vec_id % 7 = 3 THEN vec_id END) AS del
        |  FROM raw),
        |md AS (SELECT GREATEST(1, CAST(FLOOR(SQRT(CAST(t AS DOUBLE))) AS BIGINT)) AS m FROM szs),
        |cent AS (
        |  SELECT r.vec_id AS cid, r.pos, r.xm AS cm FROM raw r, md
        |  WHERE ('0x' || substring(md5(CAST(r.vec_id AS VARCHAR)), 1, 8))::BIGINT % md.m = 0),
        |asg AS (
        |  SELECT vec_id, cid AS cluster FROM (
        |    SELECT r.vec_id, c.cid,
        |      ROW_NUMBER() OVER (PARTITION BY r.vec_id ORDER BY SUM(r.xm * c.cm) DESC, c.cid) AS rn
        |    FROM raw r JOIN cent c ON r.pos = c.pos
        |    GROUP BY r.vec_id, c.cid) q
        |  WHERE rn = 1),
        |probe_ids AS (
        |  SELECT vec_id FROM (SELECT DISTINCT vec_id FROM raw WHERE vec_id % 7 <> 3) q
        |  ORDER BY md5('dprobe:' || CAST(vec_id AS VARCHAR)), vec_id LIMIT 200),
        |probes AS (
        |  SELECT r.vec_id AS probe_id, r.pos, r.xm AS pm
        |  FROM raw r JOIN probe_ids pi ON r.vec_id = pi.vec_id),
        |truth AS (
        |  SELECT probe_id, vec_id FROM (
        |    SELECT probe_id, vec_id,
        |      ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY qdot DESC, vec_id) AS rk
        |    FROM (
        |      SELECT p.probe_id, r.vec_id, SUM(p.pm * r.xm) AS qdot
        |      FROM probes p JOIN raw r ON p.pos = r.pos
        |      WHERE r.vec_id <> p.probe_id AND r.vec_id % 7 <> 3
        |      GROUP BY 1, 2) q1) q2
        |  WHERE rk <= 3),
        |nt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_truth FROM truth),
        |cells AS (
        |  SELECT probe_id, cid AS cluster FROM (
        |    SELECT p.probe_id, c.cid,
        |      ROW_NUMBER() OVER (PARTITION BY p.probe_id ORDER BY SUM(p.pm * c.cm) DESC, c.cid) AS rn
        |    FROM probes p JOIN cent c ON p.pos = c.pos
        |    GROUP BY p.probe_id, c.cid) q
        |  WHERE rn <= 4),
        |cand AS (
        |  SELECT DISTINCT ce.probe_id, a.vec_id
        |  FROM cells ce JOIN asg a ON a.cluster = ce.cluster
        |  WHERE a.vec_id <> ce.probe_id),
        |scored AS (
        |  SELECT c.probe_id, c.vec_id, SUM(p.pm * r.xm) AS qdot
        |  FROM cand c JOIN probes p ON p.probe_id = c.probe_id
        |  JOIN raw r ON r.vec_id = c.vec_id AND r.pos = p.pos
        |  GROUP BY 1, 2),
        |ret_u AS (
        |  SELECT probe_id, vec_id FROM (
        |    SELECT probe_id, vec_id,
        |      ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY qdot DESC, vec_id) AS rk
        |    FROM scored) q WHERE rk <= 3),
        |ret_m AS (
        |  SELECT probe_id, vec_id FROM (
        |    SELECT probe_id, vec_id,
        |      ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY qdot DESC, vec_id) AS rk
        |    FROM scored WHERE vec_id % 7 <> 3) q WHERE rk <= 3),
        |gu AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_returned,
        |    CAST(SUM(CASE WHEN vec_id % 7 = 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_returned_deleted,
        |    CAST(SUM(CASE WHEN EXISTS (SELECT 1 FROM truth t
        |      WHERE t.probe_id = ret_u.probe_id AND t.vec_id = ret_u.vec_id)
        |      THEN 1 ELSE 0 END) AS BIGINT) AS hits
        |  FROM ret_u),
        |gm AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_returned,
        |    CAST(SUM(CASE WHEN vec_id % 7 = 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_returned_deleted,
        |    CAST(SUM(CASE WHEN EXISTS (SELECT 1 FROM truth t
        |      WHERE t.probe_id = ret_m.probe_id AND t.vec_id = ret_m.vec_id)
        |      THEN 1 ELSE 0 END) AS BIGINT) AS hits
        |  FROM ret_m)
        |SELECT * FROM (
        |  SELECT 'unmasked' AS phase, CAST(szs.t AS BIGINT) AS n_index_rows,
        |    CAST(szs.del AS BIGINT) AS n_tombstones, gu.n_returned,
        |    gu.n_returned_deleted, nt.n_truth, gu.hits,
        |    (gu.hits * 1000000) // nt.n_truth AS recall_ppm
        |  FROM gu, nt, szs
        |  UNION ALL
        |  SELECT 'masked', CAST(szs.t AS BIGINT), CAST(szs.del AS BIGINT),
        |    gm.n_returned, gm.n_returned_deleted, nt.n_truth, gm.hits,
        |    (gm.hits * 1000000) // nt.n_truth
        |  FROM gm, nt, szs
        |  UNION ALL
        |  SELECT 'compacted', CAST(szs.t - szs.del AS BIGINT), CAST(0 AS BIGINT),
        |    gm.n_returned, gm.n_returned_deleted, nt.n_truth, gm.hits,
        |    (gm.hits * 1000000) // nt.n_truth
        |  FROM gm, nt, szs) q
        |ORDER BY phase""".stripMargin,

    "agg_wilson_ci" -> {
      val srt = Round12cOps.duckIsqrt("(10000 * clicks * (views - clicks)) // views + 9604")
      s"""WITH t AS (
         |  SELECT CAST(p_partkey % 3 AS INT) AS cohort, p_partkey AS k,
         |    ('0x' || substring(md5('wv:' || CAST(p_partkey AS VARCHAR)), 1, 6))::BIGINT % 100 AS views
         |  FROM part),
         |c AS (
         |  SELECT cohort, views,
         |    ('0x' || substring(md5('wc:' || CAST(k AS VARCHAR)), 1, 6))::BIGINT % (views + 1) AS clicks
         |  FROM t WHERE views > 0),
         |w AS (
         |  SELECT cohort, views, clicks,
         |    (clicks * 1000000) // views AS raw_ppm,
         |    $srt AS srt
         |  FROM c),
         |b AS (
         |  SELECT cohort, raw_ppm,
         |    ((10000 * clicks + 19208 - 196 * srt) * 1000000) // (10000 * views + 38416) AS lower_ppm,
         |    ((10000 * clicks + 19208 + 196 * srt) * 1000000) // (10000 * views + 38416) AS upper_ppm
         |  FROM w)
         |SELECT cohort, CAST(COUNT(*) AS BIGINT) AS n_items,
         |  CAST(SUM(lower_ppm) AS BIGINT) AS lower_mass_ppm,
         |  CAST(SUM(upper_ppm) AS BIGINT) AS upper_mass_ppm,
         |  CAST(SUM(CASE WHEN lower_ppm <= raw_ppm AND raw_ppm <= upper_ppm
         |    THEN 1 ELSE 0 END) AS BIGINT) AS n_coverage_ok,
         |  CAST(SUM(CASE WHEN lower_ppm > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_lower_pos
         |FROM b GROUP BY 1 ORDER BY cohort""".stripMargin
    },

    "agg_james_stein" ->
      """WITH base AS (
        |  SELECT CAST(c_custkey AS BIGINT) AS k,
        |    CAST(c_custkey % 3 AS INT) AS cohort,
        |    5000 + (c_custkey % 3) * 200 AS theta,
        |    5000 + (c_custkey % 3) * 200
        |      + ('0x' || substring(md5('js:' || CAST(c_custkey AS VARCHAR)), 1, 6))::BIGINT % 199 - 99 AS x
        |  FROM customer),
        |g AS (SELECT CAST(COUNT(*) AS BIGINT) AS kc,
        |    (CAST(SUM(x) AS BIGINT) * 1000) // COUNT(*) AS xbar_milli
        |  FROM base),
        |dev AS (SELECT b.*, g.kc, g.xbar_milli,
        |    b.x * 1000 - g.xbar_milli AS dev_milli
        |  FROM base b, g),
        |sh AS (SELECT CAST(1000000 - LEAST(CAST(1000000 AS HUGEINT),
        |      (CAST(MAX(kc) - 3 AS HUGEINT) * 3300 * 1000000000000)
        |        // CAST(SUM(dev_milli * dev_milli) AS HUGEINT)) AS BIGINT)
        |    AS b_shrink_ppm
        |  FROM dev),
        |sc AS (
        |  SELECT d.cohort,
        |    (d.x - d.theta) * 1000 AS raw_err,
        |    d.xbar_milli - 10 * sh.b_shrink_ppm
        |      + (sh.b_shrink_ppm * (d.dev_milli + 10000000)) // 1000000
        |      - d.theta * 1000 AS js_err,
        |    sh.b_shrink_ppm
        |  FROM dev d, sh)
        |SELECT * FROM (
        |  SELECT cohort, CAST(COUNT(*) AS BIGINT) AS n_items,
        |    CAST(MAX(b_shrink_ppm) AS BIGINT) AS b_shrink_ppm,
        |    CAST(SUM(raw_err * raw_err) AS BIGINT) AS raw_sse,
        |    CAST(SUM(js_err * js_err) AS BIGINT) AS js_sse
        |  FROM sc GROUP BY 1
        |  UNION ALL
        |  SELECT CAST(-1 AS INT), CAST(COUNT(*) AS BIGINT),
        |    CAST(MAX(b_shrink_ppm) AS BIGINT),
        |    CAST(SUM(raw_err * raw_err) AS BIGINT),
        |    CAST(SUM(js_err * js_err) AS BIGINT)
        |  FROM sc) q
        |ORDER BY cohort""".stripMargin
  )
}
