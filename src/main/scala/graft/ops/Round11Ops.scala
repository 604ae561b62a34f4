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
    // Bucket PRUNING — the read-side payoff sink_bucketed's layout buys
    // (writing buckets is half the story; a point-lookup on the bucket
    // key must scan 1/16th of the files, and the plan SAYS so —
    // "SelectedBucketsCount: 1 out of 16", spec-asserted): per-sf
    // bucketed copy of orders, literal equality filter on the smallest
    // live custkey (resolved once, O(1) driver-side — the literal is
    // what makes pruning kick in), rollup graded against the plain
    // parquet replay. At 100 TB this is the difference between one
    // bucket file and the whole table.
    "warehouse_bucket_pruning" -> ((s, d) => {
      val tbl = "graft_bktp_" + d.replaceAll("[^A-Za-z0-9]", "_")
      if (!s.catalog.tableExists(tbl)) {
        Tables.orders(s, d).write.mode("overwrite")
          .bucketBy(16, "o_custkey").sortBy("o_custkey")
          .option("path", s"${Scratch.dir}/$tbl")
          .saveAsTable(tbl)
      }
      val minKey = Tables.orders(s, d).agg(min("o_custkey")).collect()(0).getLong(0)
      s.table(tbl)
        .where(col("o_custkey") === minKey)
        .groupBy("o_custkey")
        .agg(count(lit(1)).as("n_orders"),
          sum(expr("CAST(FLOOR(o_totalprice * 100) AS BIGINT)")).as("cents"),
          min("o_orderkey").as("min_key"), max("o_orderkey").as("max_key"))
        .select(col("o_custkey").cast("bigint").as("o_custkey"),
          col("n_orders"), col("cents"),
          col("min_key").cast("bigint").as("min_key"),
          col("max_key").cast("bigint").as("max_key"))
    }),

    // SELECT * EXCEPT — the wide-table ergonomics surface (on a 400-
    // column training-features table, "everything but the blob columns"
    // is how every exploratory query starts): star expansion minus an
    // explicit column set, resolved at ANALYSIS time (the scan must
    // prune to the kept columns exactly as if they were spelled out —
    // the oracle IS the spelled-out form). Sampled row-level output
    // under the unique-orderkey total order.
    "api_sql_star_except" -> ((s, d) => {
      Tables.orders(s, d).createOrReplaceTempView("graft_sxe_orders")
      s.sql(
        """SELECT * EXCEPT (o_totalprice, o_orderdate)
          |FROM graft_sxe_orders
          |WHERE o_orderkey % 100 = 1
          |ORDER BY o_orderkey""".stripMargin)
    }),

    // Clustering-depth audit — how INTERLEAVED a table's files are on
    // its sort key (the metric a lakehouse OPTIMIZE decision reads:
    // depth 1 = perfectly clustered, depth = n_files means every file
    // overlaps every point): the SAME orders written two ways — 8
    // modulo-sliced files (every file spans the whole key range) and 8
    // arithmetic range buckets (disjoint) — per-file min/max read back
    // through _metadata.file_path to PROVE the physical layout, then
    // max depth and overlapping pairs from the 8×8 interval frame
    // (bounded by file count; the production form is a sweep over file
    // stats, same numbers). Oracle recomputes both layouts' bucket
    // min/max arithmetically from orders.
    "warehouse_clustering_depth" -> ((s, d) => {
      val dir = Scratch.opDir("clusdepth", d)
      val staged = java.nio.file.Paths.get(dir, "_STAGED")
      val o = Tables.orders(s, d).select(col("o_orderkey"))
      val mx = o.agg(max("o_orderkey")).collect()(0).getLong(0)
      if (!java.nio.file.Files.exists(staged)) {
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
        (0 to 7).foreach { b =>
          o.where(col("o_orderkey") % 8 === b)
            .write.mode("overwrite").parquet(s"$dir/mod/f$b")
          o.where(expr(s"least(o_orderkey * 8 DIV ${mx + 1}, 7)") === b)
            .write.mode("overwrite").parquet(s"$dir/range/f$b")
        }
        java.nio.file.Files.write(staged, Array.emptyByteArray)
      }
      def stats(sub: String, label: String) =
        s.read.parquet((0 to 7).map(b => s"$dir/$sub/f$b"): _*)
          .withColumn("f", regexp_extract(expr("_metadata.file_path"), s"/$sub/f(\\d+)/", 1).cast("bigint"))
          .groupBy("f")
          .agg(min("o_orderkey").as("lo"), max("o_orderkey").as("hi"))
          .withColumn("layout", lit(label))
      val files = stats("mod", "modulo").unionByName(stats("range", "range"))
      files.as("a").join(files.as("b"),
          col("a.layout") === col("b.layout"))
        .groupBy(col("a.layout").as("layout"), col("a.f").as("f"))
        .agg(
          // depth at a.lo = files covering that point
          sum(when(col("b.lo") <= col("a.lo") && col("a.lo") <= col("b.hi"), 1L)
            .otherwise(0L)).as("depth_at_lo"),
          sum(when(col("a.f") < col("b.f") &&
            col("a.lo") <= col("b.hi") && col("b.lo") <= col("a.hi"), 1L)
            .otherwise(0L)).as("pairs_from_f"))
        .groupBy("layout")
        .agg(count(lit(1)).as("n_files"),
          max("depth_at_lo").as("max_depth"),
          sum("pairs_from_f").as("overlap_pairs"))
        .orderBy("layout")
    }),

    // PR-AUC — the imbalanced-retrieval grade beside agg_auc_roc (ROC
    // flatters a 10%-positive problem; precision–recall does not):
    // planted 10% positives with +300k score lift, 19-threshold grid,
    // step integration Σ ΔTP·P_i with each precision one integer DIV
    // (per-term truncation declared) and the common recall denominator
    // P factored out until the final DIV. Verdict: beats the
    // positive-rate baseline 5×.
    "agg_auc_pr" -> ((s, d) => {
      val t = Tables.documents(s, d).select(col("doc_id"))
        .withColumn("truth", expr(s"IF(${u("apt")} % 10 = 0, 1, 0)"))
        .withColumn("score", expr(s"${u("aps")} % 700000 + truth * 300000"))
      val grid = t.crossJoin(broadcast(s.range(1, 20).select((lit(1000000L) - col("id") * 50000L).as("thr"))))
        .groupBy("thr")
        .agg(sum(when(col("truth") === 1 && col("score") >= col("thr"), 1L)
            .otherwise(0L)).as("tp"),
          sum(when(col("truth") === 0 && col("score") >= col("thr"), 1L)
            .otherwise(0L)).as("fp"))
      val tot = t.agg(sum("truth").as("p"), count(lit(1)).as("n"))
      val w19 = Window.orderBy(col("thr").desc) // 19 rows — grid-bounded
      grid
        .withColumn("tp_prev", coalesce(lag("tp", 1).over(w19), lit(0L)))
        .withColumn("contrib", expr(
          "CASE WHEN tp + fp > 0 THEN (tp - tp_prev) * tp * 1000000 DIV (tp + fp) ELSE 0 END"))
        .agg(sum("contrib").as("contrib_sum"))
        .crossJoin(broadcast(tot)) // single-row scalar attach
        .withColumn("auc_pr_ppm", expr("contrib_sum DIV p"))
        .withColumn("baseline_ppm", expr("p * 1000000 DIV n"))
        .withColumn("informative", expr("auc_pr_ppm > 5 * baseline_ppm"))
        .select("p", "n", "auc_pr_ppm", "baseline_ppm", "informative")
    }),

    // Negative-binomial moment fit — WHAT overdispersed counts look
    // like as parameters (agg_dispersion_index flags the condition;
    // capacity models need r and p): a 3-rate Poisson-ish mixture
    // (means 0.5/2/3.5 — genuinely overdispersed), method-of-moments
    // r = m²/(v−m) and p = m/v cleared to the exact rationals
    // r = Sx²/(nΣx²−Sx²−n·Sx) and p = n·Sx/(nΣx²−Sx²) — two DIVs, the
    // v > m guard graded as its own boolean.
    "agg_negbin_moments" -> ((s, d) => {
      Tables.documents(s, d).select(col("doc_id"))
        .withColumn("g", expr(s"${u("nbg")} % 3"))
        .withColumn("x", expr(s"${u("nbx")} % (2 + 3 * g)"))
        .agg(count(lit(1)).as("n"), sum("x").as("sx"),
          sum(expr("x * x")).as("sxx"))
        .withColumn("overdispersed", expr("n * sxx - sx * sx > n * sx"))
        .withColumn("r_milli", expr(
          """CASE WHEN n * sxx - sx * sx - n * sx > 0
             THEN CAST(sx AS DECIMAL(38,0)) * sx * 1000
                  DIV (CAST(n AS DECIMAL(38,0)) * sxx - CAST(sx AS DECIMAL(38,0)) * sx - CAST(n AS DECIMAL(38,0)) * sx)
             ELSE CAST(-1 AS DECIMAL(38,0)) END""").cast("long"))
        .withColumn("p_ppm", expr(
          "(CAST(n AS DECIMAL(38,0)) * sx * 1000000) DIV (CAST(n AS DECIMAL(38,0)) * sxx - CAST(sx AS DECIMAL(38,0)) * sx)").cast("long"))
        .select("n", "sx", "overdispersed", "r_milli", "p_ppm")
    }),

    // JSON-schema conformance audit — the structured-output gate every
    // tool-calling pipeline runs (the model SAID it returned
    // {answer, confidence, sources}; did it?): planted breakage —
    // truncation (malformed — unclosed object), missing confidence, a
    // string-typed confidence — classified through from_json's PERMISSIVE
    // semantics (malformed ⇒ null struct; missing-or-wrong-typed field ⇒
    // null field), which line up exactly with json_valid + TRY_CAST on the
    // oracle side. Per-class counts + ppm.
    "llm_json_schema_validate" -> ((s, d) => {
      val t = Tables.documents(s, d).select(col("doc_id"))
        .withColumn("conf", expr(s"${u("jsc")} % 100"))
        .withColumn("resp", expr(
          """CASE
             WHEN doc_id % 19 = 0 THEN concat('{"answer":"a","confidence":', CAST(conf AS STRING), ',"sources":[1,2]')
             WHEN doc_id % 13 = 0 THEN '{"answer":"a","sources":[1,2]}'
             WHEN doc_id % 17 = 0 THEN '{"answer":"a","confidence":"high","sources":[1,2]}'
             ELSE concat('{"answer":"a","confidence":', CAST(conf AS STRING), ',"sources":[1,2]}')
             END"""))
        .withColumn("parsed", expr(
          "from_json(resp, 'answer STRING, confidence BIGINT, sources ARRAY<BIGINT>')"))
        .withColumn("malformed", col("parsed").isNull ||
          (col("parsed.answer").isNull && col("parsed.confidence").isNull &&
            col("parsed.sources").isNull))
        .withColumn("conf_bad", !col("malformed") && col("parsed.confidence").isNull)
        .withColumn("valid", !col("malformed") && !col("conf_bad") &&
          expr("size(parsed.sources) = 2"))
      t.agg(count(lit(1)).as("n"),
          sum(when(col("malformed"), 1L).otherwise(0L)).as("n_malformed"),
          sum(when(col("conf_bad"), 1L).otherwise(0L)).as("n_conf_bad"),
          sum(when(col("valid"), 1L).otherwise(0L)).as("n_valid"))
        .withColumn("valid_ppm", expr("n_valid * 1000000 DIV n"))
        .select("n", "n_malformed", "n_conf_bad", "n_valid", "valid_ppm")
    }),

    // Holm–Bonferroni — the step-down multiple-testing gate beside
    // agg_benjamini_hochberg's FDR one (Holm controls FWER — the bar a
    // safety claim needs): 5 planted real effects among 20 hypotheses,
    // step-down over the 20-row rank window as a running AND (reject
    // while every smaller p passed p·(m−i+1) ≤ α·10⁶ — all integers),
    // plain Bonferroni emitted beside it to show what step-down buys.
    "agg_holm_bonferroni" -> ((s, d) => {
      val hyp = Tables.documents(s, d).where(col("doc_id") < 20)
        .select(col("doc_id").as("h"))
        .withColumn("p_ppm", expr(
          s"IF(h < 5, ${u("hbp", "h")} % 500, ${u("hbq", "h")} % 1000000)"))
      val w20 = Window.orderBy(col("p_ppm"), col("h")) // 20 rows
      hyp
        .withColumn("i", row_number().over(w20).cast("bigint"))
        .withColumn("pass", expr("p_ppm * (20 - i + 1) <= 50000"))
        .withColumn("holm_rejected", min(when(col("pass"), 1L).otherwise(0L))
          .over(w20.rowsBetween(Window.unboundedPreceding, 0)) === 1L)
        .withColumn("bonf_rejected", expr("p_ppm * 20 <= 50000"))
        .select("h", "i", "p_ppm", "holm_rejected", "bonf_rejected")
        .orderBy("i")
    }),

    // Base36 roundtrip — the compact-id codec shard names and URL slugs
    // use: fixed-width 7-digit encode by unrolled DIV/MOD (36⁷ > 7·10¹⁰
    // covers every key), decode by alphabet position, and the roundtrip
    // identity GRADED per row — the decode must reproduce the key
    // exactly in both engines.
    "fn_base36_roundtrip" -> ((s, d) => {
      val alpha = "0123456789abcdefghijklmnopqrstuvwxyz"
      val enc = (0 to 6).reverse.map(i =>
        s"substring('$alpha', CAST(o_orderkey DIV ${math.pow(36, i).toLong} % 36 AS INT) + 1, 1)")
        .mkString("concat(", ", ", ")")
      val dec = (0 to 6).map(i =>
        s"(CAST(instr('$alpha', substring(b36, ${7 - i}, 1)) AS BIGINT) - 1) * ${math.pow(36, i).toLong}")
        .mkString(" + ")
      Tables.orders(s, d).select(col("o_orderkey"))
        .where(col("o_orderkey") % 100 === 1)
        .withColumn("b36", expr(enc))
        .withColumn("decoded", expr(dec))
        .withColumn("roundtrip_ok", col("decoded") === col("o_orderkey"))
        .select(col("o_orderkey").cast("bigint").as("o_orderkey"),
          col("b36"), col("decoded"), col("roundtrip_ok"))
        .orderBy("o_orderkey")
    }),

    // Cochran–Armitage trend test — "does the rate RISE with dose?"
    // (agg_chisq asks association; ordered exposure groups deserve the
    // one-degree trend question): planted 25%→45% conversion across 5
    // ordered doses with integer scores w = 0..4, T = Σwᵢ(xᵢN − nᵢX)
    // exact, Var·N² = X(N−X)·(N·Σwᵢ²nᵢ − (Σwᵢnᵢ)²) exact, and the z²
    // verdict fully cross-multiplied T²·N·10⁴·... — no float anywhere.
    "agg_cochran_armitage" -> ((s, d) => {
      val t = Tables.documents(s, d).select(col("doc_id"))
        .withColumn("dose", expr(s"${u("cad")} % 5"))
        .withColumn("conv", expr(s"IF(${u("cac")} % 100 < 25 + 5 * dose, 1, 0)"))
      t.groupBy("dose")
        .agg(count(lit(1)).as("ni"), sum("conv").as("xi"))
        .agg(sum("ni").as("nn"), sum("xi").as("xx"),
          sum(expr("dose * xi")).as("swx"),
          sum(expr("dose * ni")).as("swn"),
          sum(expr("dose * dose * ni")).as("sw2n"))
        .withColumn("t_num", expr("swx * nn - swn * xx"))
        .withColumn("var_n3", expr(
          "CAST(xx AS DECIMAL(38,0)) * (nn - xx) * (CAST(nn AS DECIMAL(38,0)) * sw2n - CAST(swn AS DECIMAL(38,0)) * swn)"))
        .withColumn("significant", expr(
          """CAST(t_num AS DECIMAL(38,0)) * t_num * nn * 1000000
             > CAST(3841600 AS DECIMAL(38,0)) * var_n3"""))
        .select(col("nn"), col("xx"), col("t_num"),
          col("var_n3").cast("long").as("var_n3"), col("significant"))
    }),

    // Page–Hinkley — the SEQUENTIAL drift alarm (agg_ks_drift compares
    // two finished samples; PH watches a STREAM and fires mid-flight):
    // the documented fixed-reference variant (μ = 500, the planted
    // pre-shift mean; δ = 5 slack, λ = 2000 threshold — all integers),
    // planted +80 shift at the 60% mark of each type's series,
    // PH_t = cumsum(x−μ−δ) − running min, alarm when > λ. Two
    // running-window passes on one partitioned sort; ledger = first
    // alarm position fraction + alarm count, and the alarm must land
    // AFTER the shift point.
    "win_page_hinkley" -> ((s, d) => {
      val ord = Window.partitionBy("event_type").orderBy(col("ts_us"), col("event_id"))
      Tables.events(s, d)
        .select(col("event_type"), col("event_id"), col("ts_us"))
        .withColumn("n_t", count(lit(1)).over(Window.partitionBy("event_type")))
        .withColumn("rn", row_number().over(ord).cast("bigint"))
        .withColumn("x", expr(
          s"500 + ${u("phn", "event_id")} % 41 - 20 + IF(rn * 10 > n_t * 6, 80, 0)"))
        .withColumn("m_t", sum(expr("x - 500 - 5")).over(
          ord.rowsBetween(Window.unboundedPreceding, 0)))
        .withColumn("m_min", min("m_t").over(
          ord.rowsBetween(Window.unboundedPreceding, 0)))
        .withColumn("alarm", expr("m_t - m_min > 2000"))
        .groupBy("event_type")
        .agg(max("n_t").as("n"),
          sum(when(col("alarm"), 1L).otherwise(0L)).as("n_alarms"),
          min(when(col("alarm"), col("rn"))).as("first_alarm_rn"))
        .withColumn("first_alarm_pct", expr("first_alarm_rn * 100 DIV n"))
        .withColumn("fired_after_shift", expr("first_alarm_rn * 10 > n * 6"))
        .select("event_type", "n", "n_alarms", "first_alarm_rn",
          "first_alarm_pct", "fired_after_shift")
        .orderBy("event_type")
    }),

    // Matryoshka truncation recall — what 16 of 64 dims COST (MRL
    // embeddings promise graceful truncation; this measures it): both
    // engines quantize the SAME float embeddings to exact milli
    // integers (floor(e·1000) — identical IEEE input, identical floor),
    // top-1 by integer dot product under the (dot DESC, cand ASC) total
    // order, full-dim vs 16-dim prefix, recall@1 = agreement rate. The
    // dims explode into a (vec, idx, q) frame joined on idx — the shape
    // that scales as n·d, never materializing a matrix.
    "llm_matryoshka_recall" -> ((s, d) => {
      val dims = Tables.embeddings(s, d)
        .select(col("vec_id"), posexplode(col("embedding")))
        .select(col("vec_id"), col("pos").cast("bigint").as("idx"),
          expr("CAST(FLOOR(col * 1000) AS BIGINT)").as("q"))
        .localCheckpoint()
      def top1(maxIdx: Long, nm: String) = {
        val dots = dims.where(col("idx") < maxIdx)
          .select(col("vec_id").as("probe"), col("idx"), col("q").as("pq"))
          .where(col("probe") < 10)
          .join(dims.where(col("idx") < maxIdx)
            .select(col("vec_id").as("cand"), col("idx"), col("q").as("cq")), "idx")
          .where(col("probe") =!= col("cand"))
          .groupBy("probe", "cand")
          .agg(sum(expr("pq * cq")).as("dot"))
        dots.withColumn("rk", row_number().over(
            Window.partitionBy("probe").orderBy(col("dot").desc, col("cand"))))
          .where(col("rk") === 1)
          .select(col("probe"), col("cand").as(nm))
      }
      top1(64L, "full_top1").join(top1(16L, "trunc_top1"), "probe")
        .agg(count(lit(1)).as("n_probes"),
          sum(when(col("full_top1") === col("trunc_top1"), 1L).otherwise(0L)).as("n_match"))
        .withColumn("recall1_ppm", expr("n_match * 1000000 DIV n_probes"))
        .select("n_probes", "n_match", "recall1_ppm")
    }),

    // Coreness (full shell decomposition) — graph_kcore answers "who
    // survives k=6?"; coreness labels EVERY node with its maximal k.
    // Computed by the DISTRIBUTED h-index fixpoint (Lü et al.: c⁰ =
    // degree; c^{t+1}(v) = h-index of the neighbors' c^t; the fixpoint
    // IS the coreness) — six synchronous rounds, each one neighbor join
    // + a per-node rank window over ≤ deg rows + a groupBy. Six
    // materializations total where the naive per-k peel needs 48 (first
    // cut of this op ran 8.9 s at sf0.1; this one is in the graph-op
    // envelope) — and at scale the h-index superstep is exactly how
    // coreness ships on Pregel-style systems. Oracle replays the same
    // six rounds as generated CTEs; ScalaTest pins c ≥ 6 ≡ graph_kcore.
    "graph_coreness" -> ((s, d) => {
      val base = GraphOps.backboneForCoreness(s, d)
      val bi = base.select(col("a").cast("bigint").as("src"), col("b").cast("bigint").as("dst"))
        .unionAll(base.select(col("b").cast("bigint").as("src"), col("a").cast("bigint").as("dst")))
        .localCheckpoint()
      var core = bi.groupBy(col("src").as("node"))
        .agg(count(lit(1)).as("c"))
      for (_ <- 1 to 6) {
        val nbr = bi.join(core.select(col("node").as("dst"), col("c").as("nc")), "dst")
          .select(col("src").as("node"), col("nc"))
        // h-index: rank neighbor values desc; h = max over rows of
        // min(rank, value) — the window is ≤ deg rows per node
        val w = Window.partitionBy("node").orderBy(col("nc").desc)
        core = nbr
          .withColumn("rn", row_number().over(w).cast("bigint"))
          .groupBy("node")
          .agg(max(least(col("rn"), col("nc"))).as("c"))
          .localCheckpoint()
      }
      core.select(col("node"), col("c").as("coreness")).orderBy("node")
    }),

    // unionByName with missing columns — the schema-drift append every
    // long-lived pipeline hits (v2 of the feed added a column; v1 rows
    // must union in with NULLs, BY NAME, never by position): two
    // projections of orders with different column sets, allowMissing
    // fills the gaps; the oracle is the explicit NULL-padded UNION.
    "api_union_missing_cols" -> ((s, d) => {
      val v1 = Tables.orders(s, d).where(col("o_orderkey") % 200 === 1)
        .select(col("o_orderkey"), col("o_orderstatus"))
      val v2 = Tables.orders(s, d).where(col("o_orderkey") % 200 === 2)
        .select(col("o_orderkey"), col("o_orderstatus"),
          expr("CAST(FLOOR(o_totalprice * 100) AS BIGINT)").as("cents"))
      v1.unionByName(v2, allowMissingColumns = true)
        .select(col("o_orderkey").cast("bigint").as("o_orderkey"),
          col("o_orderstatus"), col("cents"))
        .orderBy("o_orderkey")
    }),

    // Bit-packing roundtrip — eight 8-bit fields in one BIGINT (the
    // feature-store trick that turns 8 columns into 1): pack by shifts
    // (exact powers of two — multiplication, no float), unpack by
    // DIV/MOD, every field's roundtrip GRADED; byte 7 kept < 128 so the
    // packed value stays in signed int64.
    "fn_bitpack_roundtrip" -> ((s, d) => {
      val fields = (0 to 7).map(i =>
        expr(s"${u(s"bp$i", "event_id")} % ${if (i == 7) 128 else 256}").as(s"f$i"))
      val pack = (0 to 7).map(i => s"f$i * ${1L << (8 * i)}").mkString(" + ")
      val unpacks = (0 to 7).map(i =>
        expr(s"packed DIV ${1L << (8 * i)} % ${if (i == 7) 128 else 256}").as(s"u$i"))
      val ok = (0 to 7).map(i => s"u$i = f$i").mkString(" AND ")
      Tables.events(s, d).select(col("event_id"))
        .where(col("event_id") % 50 === 3)
        .select(col("event_id") +: fields: _*)
        .withColumn("packed", expr(pack))
        .select((col("event_id") +: col("packed") +: (0 to 7).map(i => col(s"f$i"))) ++
          unpacks: _*)
        .withColumn("roundtrip_ok", expr(ok))
        .select("event_id", "packed", "f0", "f7", "roundtrip_ok")
        .orderBy("event_id")
    }),

    // 2³ factorial effects — the DOE contrast table (ab_ttest measures
    // one factor; an experiment with three knobs wants main effects AND
    // the interaction from ONE design): planted y = 100 + 20A + 10B +
    // 0C + 15AB ± 10, cell means over the 8 cells in declared per-cell
    // milli DIVs, main effects as 4-pair contrast averages, the AB
    // interaction as the difference-of-differences; the dead factor C
    // must read ≈ 0.
    "agg_factorial_effects" -> ((s, d) => {
      val t = Tables.documents(s, d).select(col("doc_id"))
        .withColumn("a", expr(s"${u("fea")} % 2"))
        .withColumn("b", expr(s"${u("feb")} % 2"))
        .withColumn("c", expr(s"${u("fec")} % 2"))
        .withColumn("y", expr(
          s"100 + 20 * a + 10 * b + 15 * a * b + ${u("fen")} % 21 - 10"))
      val cells = t.groupBy("a", "b", "c")
        .agg(count(lit(1)).as("n"), sum("y").as("sy"))
        .withColumn("m_milli", expr(
          """CASE WHEN sy >= 0 THEN sy * 1000 DIV n
             ELSE -((0 - sy) * 1000 DIV n) END"""))
      cells.agg(
          sum(expr("IF(a = 1, m_milli, -m_milli)")).as("ca"),
          sum(expr("IF(b = 1, m_milli, -m_milli)")).as("cb"),
          sum(expr("IF(c = 1, m_milli, -m_milli)")).as("cc"),
          sum(expr("IF(a = b, m_milli, -m_milli)")).as("cab"),
          sum("n").as("n_total"))
        .withColumn("effect_a_milli", expr(
          "CASE WHEN ca >= 0 THEN ca DIV 4 ELSE -((0 - ca) DIV 4) END"))
        .withColumn("effect_b_milli", expr(
          "CASE WHEN cb >= 0 THEN cb DIV 4 ELSE -((0 - cb) DIV 4) END"))
        .withColumn("effect_c_milli", expr(
          "CASE WHEN cc >= 0 THEN cc DIV 4 ELSE -((0 - cc) DIV 4) END"))
        .withColumn("effect_ab_milli", expr(
          "CASE WHEN cab >= 0 THEN cab DIV 4 ELSE -((0 - cab) DIV 4) END"))
        .select("n_total", "effect_a_milli", "effect_b_milli",
          "effect_c_milli", "effect_ab_milli")
    }),

    // Interrupted time series — the policy-change regression (was the
    // intervention a LEVEL jump, a SLOPE change, or both?): planted
    // y = 200 + 3·rn pre-cut, +500 level and +2 extra slope post-cut,
    // segment OLS entirely in cleared integers CENTERED AT THE CUT (so
    // each intercept IS the level at the intervention — the jump is
    // their difference), slopes and intercepts as sign-safe milli DIVs
    // (the division law), per type.
    "agg_its_segmented" -> ((s, d) => {
      val ord = Window.partitionBy("event_type").orderBy(col("ts_us"), col("event_id"))
      val base = Tables.events(s, d)
        .select(col("event_type"), col("event_id"), col("ts_us"))
        .withColumn("n_t", count(lit(1)).over(Window.partitionBy("event_type")))
        .withColumn("rn", row_number().over(ord).cast("bigint"))
        .withColumn("cut", expr("n_t * 6 DIV 10"))
        .withColumn("post", expr("IF(rn > cut, 1, 0)"))
        .withColumn("y", expr(
          s"""200 + 3 * rn + ${u("its", "event_id")} % 21 - 10
              + post * (500 + 2 * (rn - cut))"""))
        .withColumn("uu", expr("rn - cut"))
      def seg(name: String) = Seq(
        sum(when(col("post") === (if (name == "post") 1 else 0), 1L).otherwise(0L)).as(s"n_$name"),
        sum(when(col("post") === (if (name == "post") 1 else 0), col("uu")).otherwise(0L)).as(s"su_$name"),
        sum(when(col("post") === (if (name == "post") 1 else 0), col("y")).otherwise(0L)).as(s"sy_$name"),
        sum(when(col("post") === (if (name == "post") 1 else 0), expr("uu * uu")).otherwise(0L)).as(s"suu_$name"),
        sum(when(col("post") === (if (name == "post") 1 else 0), expr("uu * y")).otherwise(0L)).as(s"suy_$name"))
      def milliDiv(num: String, den: String) =
        s"""CASE WHEN $num >= 0
           THEN (CAST($num AS DECIMAL(38,0)) * 1000) DIV ($den)
           ELSE -((CAST(0 - ($num) AS DECIMAL(38,0)) * 1000) DIV ($den)) END"""
      base.groupBy("event_type")
        .agg((seg("pre") ++ seg("post")).head, (seg("pre") ++ seg("post")).tail: _*)
        .withColumn("slope_pre_milli", expr(milliDiv(
          "n_pre * suy_pre - su_pre * sy_pre",
          "CAST(n_pre AS DECIMAL(38,0)) * suu_pre - CAST(su_pre AS DECIMAL(38,0)) * su_pre")).cast("long"))
        .withColumn("slope_post_milli", expr(milliDiv(
          "n_post * suy_post - su_post * sy_post",
          "CAST(n_post AS DECIMAL(38,0)) * suu_post - CAST(su_post AS DECIMAL(38,0)) * su_post")).cast("long"))
        .withColumn("level_pre_milli", expr(
          """CASE WHEN sy_pre * 1000 - slope_pre_milli * su_pre >= 0
             THEN (sy_pre * 1000 - slope_pre_milli * su_pre) DIV n_pre
             ELSE -((slope_pre_milli * su_pre - sy_pre * 1000) DIV n_pre) END"""))
        .withColumn("level_post_milli", expr(
          """CASE WHEN sy_post * 1000 - slope_post_milli * su_post >= 0
             THEN (sy_post * 1000 - slope_post_milli * su_post) DIV n_post
             ELSE -((slope_post_milli * su_post - sy_post * 1000) DIV n_post) END"""))
        .withColumn("jump_milli", expr("level_post_milli - level_pre_milli"))
        .select("event_type", "slope_pre_milli", "slope_post_milli",
          "level_pre_milli", "level_post_milli", "jump_milli")
        .orderBy("event_type")
    }),

    // Momentum / rate-of-change — the percent-change oscillator beside
    // win_rsi's bounded one: ROC = (x_t − x_{t−12})/x_{t−12} as a
    // sign-safe milli DIV (cents are positive, so the denominator is
    // safe; the numerator takes the magnitude-negate law), one
    // partitioned sort, sampled ledger with the overbought/oversold
    // ±80-milli flags.
    "win_momentum_roc" -> ((s, d) => {
      val ord = Window.partitionBy("event_type").orderBy(col("ts_us"), col("event_id"))
      Tables.events(s, d)
        .select(col("event_type"), col("event_id"), col("ts_us"),
          floor(col("value") * 100).cast("bigint").as("cents"))
        .withColumn("prev", lag("cents", 12).over(ord))
        .where(col("prev").isNotNull && col("prev") > 0 && col("event_id") % 9 === 4)
        .withColumn("roc_milli", expr(
          """CASE WHEN cents - prev >= 0
             THEN (cents - prev) * 1000 DIV prev
             ELSE -((prev - cents) * 1000 DIV prev) END"""))
        .withColumn("signal", expr(
          """CASE WHEN roc_milli > 80 THEN 'overbought'
             WHEN roc_milli < -80 THEN 'oversold' ELSE 'neutral' END"""))
        .select("event_type", "event_id", "cents", "prev", "roc_milli", "signal")
        .orderBy("event_type", "event_id")
    }),

    // Benford MAD conformity — the auditor's number (agg_benford asks
    // "does it deviate?"; Nigrini's MAD bands say HOW MUCH): the nine
    // Benford ppm masses as shared integer LITERALS (the
    // transcendental-on-literals law — log10(1+1/d) never evaluates at
    // runtime), two planted populations from the SAME hash stream —
    // uniform values (first digits nowhere near Benford) and exact
    // powers of two (whose leading digits famously track Benford) —
    // MAD = Σ|p̂_d − benford_d| DIV 9 in exact ppm; the uniform
    // population must fail conformity and sit far above the 2^k one.
    "agg_benford_mad" -> ((s, d) => {
      val benford = Map(1 -> 301030L, 2 -> 176091L, 3 -> 124939L,
        4 -> 96910L, 5 -> 79181L, 6 -> 66947L, 7 -> 57992L, 8 -> 51153L,
        9 -> 45757L)
      val bCase = (1 to 9).map(dd => s"WHEN d = $dd THEN ${benford(dd)}")
        .mkString("CASE ", " ", " ELSE 0 END")
      def firstDigit(xExpr: String, label: String) =
        Tables.documents(s, d).select(col("doc_id"))
          .withColumn("x", expr(xExpr))
          .withColumn("d", expr("CAST(substring(CAST(x AS STRING), 1, 1) AS BIGINT)"))
          .groupBy("d").agg(count(lit(1)).as("c"))
          .withColumn("series", lit(label))
      val uni = firstDigit(s"${u("bfu")} % 99000 + 1000", "uniform")
      val pow = firstDigit(
        s"shiftleft(CAST(1 AS BIGINT), CAST(${u("bfp")} % 30 AS INT))", "pow2")
      uni.unionByName(pow)
        .withColumn("n", sum("c").over(Window.partitionBy("series")))
        .withColumn("gap", expr(s"abs(c * 1000000 DIV n - ($bCase))"))
        .groupBy("series")
        .agg(max("n").as("n"), count(lit(1)).as("n_digits"),
          expr("sum(gap) DIV 9").as("mad_ppm"))
        .withColumn("conforms", col("mad_ppm") < 15000L)
        .orderBy("series")
    }),

    // OEE — overall equipment effectiveness, the manufacturing KPI that
    // multiplies three ratios (availability × performance × quality);
    // each planted ratio is an exact count fraction, each stage one
    // declared ppm DIV, and the product re-truncates through ppm² —
    // both engines replay the identical truncation chain, and the world
    //-class ≥ 85% verdict is graded on the final ppm.
    "agg_oee" -> ((s, d) => {
      Tables.events(s, d).select(col("event_id"), col("event_type"))
        .withColumn("scheduled", lit(1L))
        .withColumn("running", expr(s"IF(${u("oea", "event_id")} % 100 < 92, 1, 0)"))
        .withColumn("at_speed", expr(
          s"IF(running = 1 AND ${u("oep", "event_id")} % 100 < 96, 1, 0)"))
        .withColumn("good", expr(
          s"IF(at_speed = 1 AND ${u("oeq", "event_id")} % 100 < 97, 1, 0)"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum("running").as("run_units"),
          sum("at_speed").as("speed_units"),
          sum("good").as("good_units"))
        .withColumn("availability_ppm", expr("run_units * 1000000 DIV n"))
        .withColumn("performance_ppm", expr("speed_units * 1000000 DIV run_units"))
        .withColumn("quality_ppm", expr("good_units * 1000000 DIV speed_units"))
        .withColumn("oee_ppm", expr(
          """availability_ppm * performance_ppm DIV 1000000
             * quality_ppm DIV 1000000"""))
        .withColumn("world_class", col("oee_ppm") >= 850000L)
        .select("event_type", "n", "availability_ppm", "performance_ppm",
          "quality_ppm", "oee_ppm", "world_class")
        .orderBy("event_type")
    }),

    // MTBF / MTTR — the reliability pair read off an event log (uptime
    // between failures, downtime to repair): planted ~2% failure marks
    // on the per-type time axis, inter-failure gaps in exact
    // microseconds via lag over failure events only, MTBF = Σgap DIV
    // (k−1) and the failure-rate ppm beside it — the shape every SRE
    // error-budget review reads.
    "win_mtbf" -> ((s, d) => {
      val fails = Tables.events(s, d)
        .select(col("event_type"), col("event_id"), col("ts_us"))
        .where(expr(s"${u("mtf", "event_id")} % 50 = 0"))
      val ord = Window.partitionBy("event_type").orderBy(col("ts_us"), col("event_id"))
      val gaps = fails
        .withColumn("prev_ts", lag("ts_us", 1).over(ord))
        .where(col("prev_ts").isNotNull)
        .withColumn("gap_us", col("ts_us") - col("prev_ts"))
      val totals = Tables.events(s, d).groupBy("event_type")
        .agg(count(lit(1)).as("n_events"))
      gaps.groupBy("event_type")
        .agg(count(lit(1)).as("n_gaps"),
          sum("gap_us").as("uptime_us"),
          max("gap_us").as("max_gap_us"))
        .withColumn("mtbf_us", expr(
          "CASE WHEN uptime_us >= 0 THEN uptime_us DIV n_gaps ELSE 0 END"))
        .join(totals, "event_type")
        .withColumn("failure_rate_ppm", expr("(n_gaps + 1) * 1000000 DIV n_events"))
        .select("event_type", "n_events", "n_gaps", "mtbf_us",
          "max_gap_us", "failure_rate_ppm")
        .orderBy("event_type")
    }),

    // Record highs — the H_n law (in any exchangeable tie-free sequence
    // the expected number of running records is the harmonic number —
    // position, not values, drives it): per-type md5 shuffle order with
    // an INDEPENDENT-namespace tie-break key (order and value sharing a
    // hash would break exchangeability), records by a running strict
    // max, E in exact micro as Σ 10⁶ DIV i over a broadcast range, and
    // the 3σ sanity verdict cross-multiplied with Var ≈ H_n.
    "win_record_highs" -> ((s, d) => {
      val ord = Window.partitionBy("event_type").orderBy(col("ok"))
      val recs = Tables.events(s, d)
        .select(col("event_type"), col("event_id"),
          floor(col("value") * 100).cast("bigint").as("cents"))
        .withColumn("ok", expr(u("ro", "event_id")))
        // 2^33 span keeps the composite collision-free and cents-major
        .withColumn("x", expr(s"cents * 8589934592 + ${u("rv", "event_id")}"))
        .withColumn("rm", max("x").over(ord.rowsBetween(Window.unboundedPreceding, -1)))
        .withColumn("is_record", col("rm").isNull || col("x") > col("rm"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(when(col("is_record"), 1L).otherwise(0L)).as("records"))
      val maxN = recs.agg(max("n")).collect()(0).getLong(0)
      val harmonics = recs.select("event_type", "n")
        .join(s.range(1, maxN + 1).select(col("id").as("i")), col("i") <= col("n"))
        .groupBy("event_type")
        .agg(sum(expr("1000000 DIV i")).as("e_micro"))
      recs.join(harmonics, "event_type")
        .withColumn("within_3sigma", expr(
          """CAST(records * 1000000 - e_micro AS DECIMAL(38,0))
             * (records * 1000000 - e_micro)
             < CAST(9 AS DECIMAL(38,0)) * e_micro * 1000000"""))
        .select("event_type", "n", "records", "e_micro", "within_3sigma")
        .orderBy("event_type")
    }),

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
    // Same literal point-lookup replayed without the bucket layout.
    "warehouse_bucket_pruning" ->
      """SELECT CAST(o_custkey AS BIGINT) AS o_custkey,
        |  CAST(COUNT(*) AS BIGINT) AS n_orders,
        |  CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents,
        |  CAST(MIN(o_orderkey) AS BIGINT) AS min_key,
        |  CAST(MAX(o_orderkey) AS BIGINT) AS max_key
        |FROM orders WHERE o_custkey = (SELECT MIN(o_custkey) FROM orders)
        |GROUP BY 1""".stripMargin,

    // The spelled-out form the star-except expansion must equal.
    "api_sql_star_except" ->
      """SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
        |  CAST(o_custkey AS BIGINT) AS o_custkey,
        |  o_orderstatus, o_orderpriority
        |FROM orders WHERE o_orderkey % 100 = 1
        |ORDER BY o_orderkey""".stripMargin,

    // Same three planted ratios, same ppm truncation chain.
    "agg_oee" ->
      """WITH t AS (SELECT event_type, event_id,
        |    CASE WHEN ('0x' || substring(md5('oea:' || CAST(event_id AS VARCHAR)), 1, 8))::BIGINT % 100 < 92
        |      THEN 1 ELSE 0 END AS running
        |  FROM events),
        |v AS (SELECT event_type, running,
        |    CASE WHEN running = 1 AND ('0x' || substring(md5('oep:' || CAST(event_id AS VARCHAR)), 1, 8))::BIGINT % 100 < 96
        |      THEN 1 ELSE 0 END AS at_speed,
        |    event_id
        |  FROM t),
        |w AS (SELECT event_type, running, at_speed,
        |    CASE WHEN at_speed = 1 AND ('0x' || substring(md5('oeq:' || CAST(event_id AS VARCHAR)), 1, 8))::BIGINT % 100 < 97
        |      THEN 1 ELSE 0 END AS good
        |  FROM v),
        |g AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(running) AS BIGINT) AS run_units,
        |    CAST(SUM(at_speed) AS BIGINT) AS speed_units,
        |    CAST(SUM(good) AS BIGINT) AS good_units
        |  FROM w GROUP BY 1),
        |p AS (SELECT *, run_units * 1000000 // n AS availability_ppm,
        |    speed_units * 1000000 // run_units AS performance_ppm,
        |    good_units * 1000000 // speed_units AS quality_ppm FROM g)
        |SELECT event_type, n, availability_ppm, performance_ppm, quality_ppm,
        |  availability_ppm * performance_ppm // 1000000 * quality_ppm // 1000000 AS oee_ppm,
        |  availability_ppm * performance_ppm // 1000000 * quality_ppm // 1000000 >= 850000 AS world_class
        |FROM p ORDER BY event_type""".stripMargin,

    // Same ~2% failure marks, same inter-failure gap arithmetic.
    "win_mtbf" ->
      """WITH f AS (SELECT event_type, event_id, epoch_us(ts) AS ts_us
        |  FROM events
        |  WHERE ('0x' || substring(md5('mtf:' || CAST(event_id AS VARCHAR)), 1, 8))::BIGINT % 50 = 0),
        |l AS (SELECT *, LAG(ts_us, 1) OVER (PARTITION BY event_type
        |    ORDER BY ts_us, event_id) AS prev_ts FROM f),
        |g AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_gaps,
        |    CAST(SUM(ts_us - prev_ts) AS BIGINT) AS uptime_us,
        |    CAST(MAX(ts_us - prev_ts) AS BIGINT) AS max_gap_us
        |  FROM l WHERE prev_ts IS NOT NULL GROUP BY 1),
        |t AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events
        |  FROM events GROUP BY 1)
        |SELECT g.event_type, n_events, n_gaps,
        |  CASE WHEN uptime_us >= 0 THEN uptime_us // n_gaps ELSE 0 END AS mtbf_us,
        |  max_gap_us, (n_gaps + 1) * 1000000 // n_events AS failure_rate_ppm
        |FROM g JOIN t ON g.event_type = t.event_type
        |ORDER BY g.event_type""".stripMargin,

    // Same lag-12 sampling, same sign-safe milli ROC.
    "win_momentum_roc" ->
      """WITH e AS (SELECT event_type, event_id, epoch_us(ts) AS ts_us,
        |    CAST(FLOOR(value * 100) AS BIGINT) AS cents FROM events),
        |l AS (SELECT *, LAG(cents, 12) OVER (PARTITION BY event_type
        |    ORDER BY ts_us, event_id) AS prev FROM e),
        |r AS (SELECT *, CASE WHEN cents - prev >= 0
        |    THEN (cents - prev) * 1000 // prev
        |    ELSE -((prev - cents) * 1000 // prev) END AS roc_milli
        |  FROM l WHERE prev IS NOT NULL AND prev > 0 AND event_id % 9 = 4)
        |SELECT event_type, event_id, cents, prev, roc_milli,
        |  CASE WHEN roc_milli > 80 THEN 'overbought'
        |    WHEN roc_milli < -80 THEN 'oversold' ELSE 'neutral' END AS signal
        |FROM r ORDER BY event_type, event_id""".stripMargin,

    // Same literal Benford masses, same first-digit ppm gaps.
    "agg_benford_mad" ->
      """WITH uni AS (SELECT 'uniform' AS series,
        |    ('0x' || substring(md5('bfu:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 99000 + 1000 AS x
        |  FROM documents),
        |p2 AS (SELECT 'pow2' AS series,
        |    CAST(1 AS BIGINT) << CAST(('0x' || substring(md5('bfp:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 30 AS INT) AS x
        |  FROM documents),
        |a AS (SELECT series, CAST(substring(CAST(x AS VARCHAR), 1, 1) AS BIGINT) AS d
        |  FROM (SELECT * FROM uni UNION ALL SELECT * FROM p2)),
        |g AS (SELECT series, d, CAST(COUNT(*) AS BIGINT) AS c FROM a GROUP BY 1, 2),
        |t AS (SELECT *, CAST(SUM(c) OVER (PARTITION BY series) AS BIGINT) AS n FROM g),
        |m AS (SELECT series, n,
        |    ABS(c * 1000000 // n - (CASE WHEN d = 1 THEN 301030 WHEN d = 2 THEN 176091
        |      WHEN d = 3 THEN 124939 WHEN d = 4 THEN 96910 WHEN d = 5 THEN 79181
        |      WHEN d = 6 THEN 66947 WHEN d = 7 THEN 57992 WHEN d = 8 THEN 51153
        |      WHEN d = 9 THEN 45757 ELSE 0 END)) AS gap
        |  FROM t)
        |SELECT series, CAST(MAX(n) AS BIGINT) AS n,
        |  CAST(COUNT(*) AS BIGINT) AS n_digits,
        |  CAST(SUM(gap) // 9 AS BIGINT) AS mad_ppm,
        |  SUM(gap) // 9 < 15000 AS conforms
        |FROM m GROUP BY 1 ORDER BY 1""".stripMargin,

    // Same unweighted cell means, same ±contrasts ÷ 4.
    "agg_factorial_effects" ->
      """WITH t AS (SELECT doc_id,
        |    ('0x' || substring(md5('fea:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 2 AS a,
        |    ('0x' || substring(md5('feb:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 2 AS b,
        |    ('0x' || substring(md5('fec:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 2 AS c,
        |    ('0x' || substring(md5('fen:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 21 - 10 AS e
        |  FROM documents),
        |y AS (SELECT a, b, c, 100 + 20 * a + 10 * b + 15 * a * b + e AS y FROM t),
        |cells AS (SELECT a, b, c, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(y) AS BIGINT) AS sy
        |  FROM y GROUP BY 1, 2, 3),
        |m AS (SELECT *, CASE WHEN sy >= 0 THEN sy * 1000 // n
        |    ELSE -((0 - sy) * 1000 // n) END AS m_milli FROM cells),
        |ct AS (SELECT
        |    CAST(SUM(CASE WHEN a = 1 THEN m_milli ELSE -m_milli END) AS BIGINT) AS ca,
        |    CAST(SUM(CASE WHEN b = 1 THEN m_milli ELSE -m_milli END) AS BIGINT) AS cb,
        |    CAST(SUM(CASE WHEN c = 1 THEN m_milli ELSE -m_milli END) AS BIGINT) AS cc,
        |    CAST(SUM(CASE WHEN a = b THEN m_milli ELSE -m_milli END) AS BIGINT) AS cab,
        |    CAST(SUM(n) AS BIGINT) AS n_total
        |  FROM m)
        |SELECT n_total,
        |  CASE WHEN ca >= 0 THEN ca // 4 ELSE -((0 - ca) // 4) END AS effect_a_milli,
        |  CASE WHEN cb >= 0 THEN cb // 4 ELSE -((0 - cb) // 4) END AS effect_b_milli,
        |  CASE WHEN cc >= 0 THEN cc // 4 ELSE -((0 - cc) // 4) END AS effect_c_milli,
        |  CASE WHEN cab >= 0 THEN cab // 4 ELSE -((0 - cab) // 4) END AS effect_ab_milli
        |FROM ct""".stripMargin,

    // Same cut-centered segment OLS, same sign-safe milli DIVs.
    "agg_its_segmented" ->
      """WITH e AS (SELECT event_type, event_id, epoch_us(ts) AS ts_us,
        |    CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n_t,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY event_type
        |      ORDER BY epoch_us(ts), event_id) AS BIGINT) AS rn
        |  FROM events),
        |x AS (SELECT *, n_t * 6 // 10 AS cut,
        |    CASE WHEN rn > n_t * 6 // 10 THEN 1 ELSE 0 END AS post FROM e),
        |y AS (SELECT *, rn - cut AS uu,
        |    200 + 3 * rn + ('0x' || substring(md5('its:' || CAST(event_id AS VARCHAR)), 1, 8))::BIGINT % 21 - 10
        |      + post * (500 + 2 * (rn - cut)) AS y
        |  FROM x),
        |g AS (SELECT event_type,
        |    CAST(SUM(CASE WHEN post = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_pre,
        |    CAST(SUM(CASE WHEN post = 0 THEN uu ELSE 0 END) AS BIGINT) AS su_pre,
        |    CAST(SUM(CASE WHEN post = 0 THEN y ELSE 0 END) AS BIGINT) AS sy_pre,
        |    CAST(SUM(CASE WHEN post = 0 THEN uu * uu ELSE 0 END) AS BIGINT) AS suu_pre,
        |    CAST(SUM(CASE WHEN post = 0 THEN uu * y ELSE 0 END) AS BIGINT) AS suy_pre,
        |    CAST(SUM(CASE WHEN post = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_post,
        |    CAST(SUM(CASE WHEN post = 1 THEN uu ELSE 0 END) AS BIGINT) AS su_post,
        |    CAST(SUM(CASE WHEN post = 1 THEN y ELSE 0 END) AS BIGINT) AS sy_post,
        |    CAST(SUM(CASE WHEN post = 1 THEN uu * uu ELSE 0 END) AS BIGINT) AS suu_post,
        |    CAST(SUM(CASE WHEN post = 1 THEN uu * y ELSE 0 END) AS BIGINT) AS suy_post
        |  FROM y GROUP BY 1),
        |sl AS (SELECT *,
        |    CASE WHEN n_pre * suy_pre - su_pre * sy_pre >= 0
        |      THEN (CAST(n_pre * suy_pre - su_pre * sy_pre AS HUGEINT) * 1000)
        |        // (CAST(n_pre AS HUGEINT) * suu_pre - CAST(su_pre AS HUGEINT) * su_pre)
        |      ELSE -((CAST(su_pre * sy_pre - n_pre * suy_pre AS HUGEINT) * 1000)
        |        // (CAST(n_pre AS HUGEINT) * suu_pre - CAST(su_pre AS HUGEINT) * su_pre)) END AS slope_pre_milli,
        |    CASE WHEN n_post * suy_post - su_post * sy_post >= 0
        |      THEN (CAST(n_post * suy_post - su_post * sy_post AS HUGEINT) * 1000)
        |        // (CAST(n_post AS HUGEINT) * suu_post - CAST(su_post AS HUGEINT) * su_post)
        |      ELSE -((CAST(su_post * sy_post - n_post * suy_post AS HUGEINT) * 1000)
        |        // (CAST(n_post AS HUGEINT) * suu_post - CAST(su_post AS HUGEINT) * su_post)) END AS slope_post_milli
        |  FROM g),
        |lv AS (SELECT *,
        |    CASE WHEN sy_pre * 1000 - slope_pre_milli * su_pre >= 0
        |      THEN (sy_pre * 1000 - slope_pre_milli * su_pre) // n_pre
        |      ELSE -((slope_pre_milli * su_pre - sy_pre * 1000) // n_pre) END AS level_pre_milli,
        |    CASE WHEN sy_post * 1000 - slope_post_milli * su_post >= 0
        |      THEN (sy_post * 1000 - slope_post_milli * su_post) // n_post
        |      ELSE -((slope_post_milli * su_post - sy_post * 1000) // n_post) END AS level_post_milli
        |  FROM sl)
        |SELECT event_type,
        |  CAST(slope_pre_milli AS BIGINT) AS slope_pre_milli,
        |  CAST(slope_post_milli AS BIGINT) AS slope_post_milli,
        |  CAST(level_pre_milli AS BIGINT) AS level_pre_milli,
        |  CAST(level_post_milli AS BIGINT) AS level_post_milli,
        |  CAST(level_post_milli - level_pre_milli AS BIGINT) AS jump_milli
        |FROM lv ORDER BY event_type""".stripMargin,

    // Same six h-index rounds replayed as generated chained CTEs.
    "graph_coreness" -> {
      val rounds = (1 to 6).map { t =>
        val prev = if (t == 1) "c0" else s"c${t - 1}"
        s"""n$t AS (SELECT bi.src AS node, p.c AS nc
           |  FROM bi JOIN $prev p ON p.node = bi.dst),
           |r$t AS (SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY node
           |    ORDER BY nc DESC) AS BIGINT) AS rn FROM n$t),
           |c$t AS MATERIALIZED (SELECT node, CAST(MAX(LEAST(rn, nc)) AS BIGINT) AS c
           |  FROM r$t GROUP BY 1)"""
      }.mkString(",\n")
      s"""WITH ${GraphOps.coreOracleCtes},
         |bi AS MATERIALIZED (SELECT CAST(a AS BIGINT) AS src, CAST(b AS BIGINT) AS dst FROM h
         |       UNION ALL SELECT CAST(b AS BIGINT), CAST(a AS BIGINT) FROM h),
         |c0 AS MATERIALIZED (SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS c
         |  FROM bi GROUP BY 1),
         |$rounds
         |SELECT node, c AS coreness FROM c6 ORDER BY node""".stripMargin
    },

    // The explicit NULL-padded form the by-name union must equal.
    "api_union_missing_cols" ->
      """SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey, o_orderstatus,
        |  CAST(NULL AS BIGINT) AS cents
        |FROM orders WHERE o_orderkey % 200 = 1
        |UNION ALL
        |SELECT CAST(o_orderkey AS BIGINT), o_orderstatus,
        |  CAST(FLOOR(o_totalprice * 100) AS BIGINT)
        |FROM orders WHERE o_orderkey % 200 = 2
        |ORDER BY o_orderkey""".stripMargin,

    // Same shift pack, same DIV/MOD unpack, same graded identity.
    "fn_bitpack_roundtrip" ->
      ("""WITH f AS (SELECT event_id, """ + (0 to 7).map(i =>
          s"('0x' || substring(md5('bp$i:' || CAST(event_id AS VARCHAR)), 1, 8))::BIGINT % ${if (i == 7) 128 else 256} AS f$i")
          .mkString(", ") + """
        |  FROM events WHERE event_id % 50 = 3),
        |p AS (SELECT *, """ + (0 to 7).map(i => s"f$i * ${1L << (8 * i)}").mkString(" + ") + """ AS packed FROM f)
        |SELECT event_id, packed, f0, f7,
        |  """ + (0 to 7).map(i =>
          s"packed // ${1L << (8 * i)} % ${if (i == 7) 128 else 256} = f$i").mkString(" AND ") + """ AS roundtrip_ok
        |FROM p ORDER BY event_id""").stripMargin,

    // Same integer trend statistic, same cross-multiplied z².
    "agg_cochran_armitage" ->
      """WITH t AS (SELECT doc_id,
        |    ('0x' || substring(md5('cad:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 5 AS dose
        |  FROM documents),
        |c AS (SELECT dose,
        |    CASE WHEN ('0x' || substring(md5('cac:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100
        |      < 25 + 5 * dose THEN 1 ELSE 0 END AS conv
        |  FROM t),
        |g AS (SELECT dose, CAST(COUNT(*) AS BIGINT) AS ni, CAST(SUM(conv) AS BIGINT) AS xi
        |  FROM c GROUP BY 1),
        |a AS (SELECT CAST(SUM(ni) AS BIGINT) AS nn, CAST(SUM(xi) AS BIGINT) AS xx,
        |    CAST(SUM(dose * xi) AS BIGINT) AS swx, CAST(SUM(dose * ni) AS BIGINT) AS swn,
        |    CAST(SUM(dose * dose * ni) AS BIGINT) AS sw2n FROM g)
        |SELECT nn, xx, swx * nn - swn * xx AS t_num,
        |  CAST(CAST(xx AS HUGEINT) * (nn - xx)
        |    * (CAST(nn AS HUGEINT) * sw2n - CAST(swn AS HUGEINT) * swn) AS BIGINT) AS var_n3,
        |  CAST(swx * nn - swn * xx AS HUGEINT) * (swx * nn - swn * xx) * nn * 1000000
        |    > CAST(3841600 AS HUGEINT) * (CAST(xx AS HUGEINT) * (nn - xx)
        |      * (CAST(nn AS HUGEINT) * sw2n - CAST(swn AS HUGEINT) * swn)) AS significant
        |FROM a""".stripMargin,

    // Same fixed-reference PH recursion-free form, same planted shift.
    "win_page_hinkley" ->
      """WITH e AS (SELECT event_type, event_id, epoch_us(ts) AS ts_us,
        |    CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n_t,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY event_type
        |      ORDER BY epoch_us(ts), event_id) AS BIGINT) AS rn
        |  FROM events),
        |x AS (SELECT *, 500 + ('0x' || substring(md5('phn:' || CAST(event_id AS VARCHAR)), 1, 8))::BIGINT % 41 - 20
        |    + CASE WHEN rn * 10 > n_t * 6 THEN 80 ELSE 0 END AS x
        |  FROM e),
        |m AS (SELECT *, CAST(SUM(x - 500 - 5) OVER w AS BIGINT) AS m_t
        |  FROM x WINDOW w AS (PARTITION BY event_type ORDER BY ts_us, event_id
        |    ROWS UNBOUNDED PRECEDING)),
        |mm AS (SELECT *, CAST(MIN(m_t) OVER (PARTITION BY event_type ORDER BY ts_us, event_id
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS m_min FROM m),
        |al AS (SELECT *, m_t - m_min > 2000 AS alarm FROM mm),
        |g AS (SELECT event_type, CAST(MAX(n_t) AS BIGINT) AS n,
        |    CAST(SUM(CASE WHEN alarm THEN 1 ELSE 0 END) AS BIGINT) AS n_alarms,
        |    CAST(MIN(CASE WHEN alarm THEN rn END) AS BIGINT) AS first_alarm_rn
        |  FROM al GROUP BY 1)
        |SELECT event_type, n, n_alarms, first_alarm_rn,
        |  first_alarm_rn * 100 // n AS first_alarm_pct,
        |  first_alarm_rn * 10 > n * 6 AS fired_after_shift
        |FROM g ORDER BY event_type""".stripMargin,

    // Same milli quantization, same (dot DESC, cand ASC) total order.
    "llm_matryoshka_recall" ->
      """WITH dims AS (SELECT vec_id, CAST(i - 1 AS BIGINT) AS idx,
        |    CAST(FLOOR(embedding[i] * 1000) AS BIGINT) AS q
        |  FROM embeddings, generate_series(1, 64) t(i)),
        |dots AS (SELECT w AS width, p.vec_id AS probe, c.vec_id AS cand,
        |    CAST(SUM(p.q * c.q) AS BIGINT) AS dot
        |  FROM dims p JOIN dims c ON p.idx = c.idx
        |  CROSS JOIN (SELECT UNNEST([16, 64]) AS w) wt
        |  WHERE p.vec_id < 10 AND p.vec_id <> c.vec_id AND p.idx < w AND c.idx < w
        |  GROUP BY 1, 2, 3),
        |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY width, probe
        |    ORDER BY dot DESC, cand) AS rk FROM dots),
        |t1 AS (SELECT probe,
        |    MAX(CASE WHEN width = 64 THEN cand END) AS full_top1,
        |    MAX(CASE WHEN width = 16 THEN cand END) AS trunc_top1
        |  FROM r WHERE rk = 1 GROUP BY 1)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_probes,
        |  CAST(SUM(CASE WHEN full_top1 = trunc_top1 THEN 1 ELSE 0 END) AS BIGINT) AS n_match,
        |  CAST(SUM(CASE WHEN full_top1 = trunc_top1 THEN 1 ELSE 0 END) * 1000000 // COUNT(*) AS BIGINT) AS recall1_ppm
        |FROM t1""".stripMargin,

    // Same planted breakage, same json_valid + TRY_CAST classes.
    "llm_json_schema_validate" ->
      """WITH t AS (SELECT doc_id,
        |    ('0x' || substring(md5('jsc:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 AS conf
        |  FROM documents),
        |r AS (SELECT doc_id,
        |    CASE
        |      WHEN doc_id % 19 = 0 THEN '{"answer":"a","confidence":' || CAST(conf AS VARCHAR) || ',"sources":[1,2]'
        |      WHEN doc_id % 13 = 0 THEN '{"answer":"a","sources":[1,2]}'
        |      WHEN doc_id % 17 = 0 THEN '{"answer":"a","confidence":"high","sources":[1,2]}'
        |      ELSE '{"answer":"a","confidence":' || CAST(conf AS VARCHAR) || ',"sources":[1,2]}'
        |    END AS resp
        |  FROM t),
        |c AS (SELECT
        |    CASE WHEN NOT json_valid(resp) THEN 1 ELSE 0 END AS malformed,
        |    CASE WHEN json_valid(resp)
        |      AND TRY_CAST(json_extract_string(resp, '$.confidence') AS BIGINT) IS NULL
        |      THEN 1 ELSE 0 END AS conf_bad,
        |    CASE WHEN json_valid(resp)
        |      AND TRY_CAST(json_extract_string(resp, '$.confidence') AS BIGINT) IS NOT NULL
        |      AND json_array_length(json_extract(resp, '$.sources')) = 2
        |      THEN 1 ELSE 0 END AS valid
        |  FROM r)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(malformed) AS BIGINT) AS n_malformed,
        |  CAST(SUM(conf_bad) AS BIGINT) AS n_conf_bad,
        |  CAST(SUM(valid) AS BIGINT) AS n_valid,
        |  CAST(SUM(valid) * 1000000 // COUNT(*) AS BIGINT) AS valid_ppm
        |FROM c""".stripMargin,

    // Same step-down running AND over the 20-row rank order.
    "agg_holm_bonferroni" ->
      """WITH h AS (SELECT doc_id AS h FROM documents WHERE doc_id < 20),
        |p AS (SELECT h,
        |    CASE WHEN h < 5
        |      THEN ('0x' || substring(md5('hbp:' || CAST(h AS VARCHAR)), 1, 8))::BIGINT % 500
        |      ELSE ('0x' || substring(md5('hbq:' || CAST(h AS VARCHAR)), 1, 8))::BIGINT % 1000000
        |    END AS p_ppm
        |  FROM h),
        |r AS (SELECT *, CAST(ROW_NUMBER() OVER (ORDER BY p_ppm, h) AS BIGINT) AS i FROM p),
        |s AS (SELECT *, CASE WHEN p_ppm * (20 - i + 1) <= 50000 THEN 1 ELSE 0 END AS pass FROM r),
        |q AS (SELECT *, MIN(pass) OVER (ORDER BY p_ppm, h
        |    ROWS UNBOUNDED PRECEDING) = 1 AS holm_rejected FROM s)
        |SELECT h, i, p_ppm, holm_rejected,
        |  p_ppm * 20 <= 50000 AS bonf_rejected
        |FROM q ORDER BY i""".stripMargin,

    // Same unrolled 7-digit codec, same graded identity.
    "fn_base36_roundtrip" ->
      ("""WITH e AS (SELECT o_orderkey,
        |    """ + (0 to 6).reverse.map(i =>
            s"substring('0123456789abcdefghijklmnopqrstuvwxyz', CAST(o_orderkey // ${math.pow(36, i).toLong} % 36 AS INT) + 1, 1)")
            .mkString(" || ") + """ AS b36
        |  FROM orders WHERE o_orderkey % 100 = 1),
        |d AS (SELECT *, """ + (0 to 6).map(i =>
            s"(CAST(instr('0123456789abcdefghijklmnopqrstuvwxyz', substring(b36, ${7 - i}, 1)) AS BIGINT) - 1) * ${math.pow(36, i).toLong}")
            .mkString(" + ") + """ AS decoded FROM e)
        |SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey, b36, decoded,
        |  decoded = o_orderkey AS roundtrip_ok
        |FROM d ORDER BY o_orderkey""").stripMargin,

    // Same two layouts recomputed arithmetically from orders.
    "warehouse_clustering_depth" ->
      """WITH mx AS (SELECT MAX(o_orderkey) AS mx FROM orders),
        |modf AS (SELECT o_orderkey % 8 AS f,
        |    CAST(MIN(o_orderkey) AS BIGINT) AS lo, CAST(MAX(o_orderkey) AS BIGINT) AS hi
        |  FROM orders GROUP BY 1),
        |rngf AS (SELECT LEAST(o_orderkey * 8 // (mx + 1), 7) AS f,
        |    CAST(MIN(o_orderkey) AS BIGINT) AS lo, CAST(MAX(o_orderkey) AS BIGINT) AS hi
        |  FROM orders CROSS JOIN mx GROUP BY 1),
        |files AS (SELECT 'modulo' AS layout, f, lo, hi FROM modf
        |  UNION ALL SELECT 'range', f, lo, hi FROM rngf),
        |pf AS (SELECT a.layout, a.f,
        |    CAST(SUM(CASE WHEN b.lo <= a.lo AND a.lo <= b.hi THEN 1 ELSE 0 END) AS BIGINT) AS depth_at_lo,
        |    CAST(SUM(CASE WHEN a.f < b.f AND a.lo <= b.hi AND b.lo <= a.hi THEN 1 ELSE 0 END) AS BIGINT) AS pairs_from_f
        |  FROM files a JOIN files b ON a.layout = b.layout
        |  GROUP BY 1, 2)
        |SELECT layout, CAST(COUNT(*) AS BIGINT) AS n_files,
        |  CAST(MAX(depth_at_lo) AS BIGINT) AS max_depth,
        |  CAST(SUM(pairs_from_f) AS BIGINT) AS overlap_pairs
        |FROM pf GROUP BY 1 ORDER BY 1""".stripMargin,

    // Same grid, same per-term precision truncation, same final DIV.
    "agg_auc_pr" ->
      """WITH t AS (SELECT doc_id,
        |    CASE WHEN ('0x' || substring(md5('apt:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 10 = 0
        |      THEN 1 ELSE 0 END AS truth
        |  FROM documents),
        |sc AS (SELECT truth,
        |    ('0x' || substring(md5('aps:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 700000
        |      + truth * 300000 AS score FROM t),
        |g AS (SELECT CAST(1000000 - v * 50000 AS BIGINT) AS thr FROM generate_series(1, 19) s(v)),
        |cm AS (SELECT thr,
        |    CAST(SUM(CASE WHEN truth = 1 AND score >= thr THEN 1 ELSE 0 END) AS BIGINT) AS tp,
        |    CAST(SUM(CASE WHEN truth = 0 AND score >= thr THEN 1 ELSE 0 END) AS BIGINT) AS fp
        |  FROM sc CROSS JOIN g GROUP BY 1),
        |st AS (SELECT *, COALESCE(LAG(tp, 1) OVER (ORDER BY thr DESC), 0) AS tp_prev FROM cm),
        |c AS (SELECT CAST(SUM(CASE WHEN tp + fp > 0
        |    THEN (tp - tp_prev) * tp * 1000000 // (tp + fp) ELSE 0 END) AS BIGINT) AS contrib_sum
        |  FROM st),
        |tot AS (SELECT CAST(SUM(truth) AS BIGINT) AS p, CAST(COUNT(*) AS BIGINT) AS n FROM t)
        |SELECT p, n, contrib_sum // p AS auc_pr_ppm,
        |  p * 1000000 // n AS baseline_ppm,
        |  contrib_sum // p > 5 * (p * 1000000 // n) AS informative
        |FROM c CROSS JOIN tot""".stripMargin,

    // Same mixture plant, same cleared moment rationals.
    "agg_negbin_moments" ->
      """WITH t AS (SELECT doc_id,
        |    ('0x' || substring(md5('nbg:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 3 AS g
        |  FROM documents),
        |v AS (SELECT ('0x' || substring(md5('nbx:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % (2 + 3 * g) AS x FROM t),
        |a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS sx,
        |    CAST(SUM(x * x) AS BIGINT) AS sxx FROM v)
        |SELECT n, sx, n * sxx - sx * sx > n * sx AS overdispersed,
        |  CAST(CASE WHEN n * sxx - sx * sx - n * sx > 0
        |    THEN CAST(sx AS HUGEINT) * sx * 1000
        |      // (CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx - CAST(n AS HUGEINT) * sx)
        |    ELSE -1 END AS BIGINT) AS r_milli,
        |  CAST((CAST(n AS HUGEINT) * sx * 1000000)
        |    // (CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx) AS BIGINT) AS p_ppm
        |FROM a""".stripMargin,

    // Same shuffle order, same tie-free composite, same harmonic sum.
    "win_record_highs" ->
      """WITH e AS (SELECT event_type, event_id,
        |    CAST(FLOOR(value * 100) AS BIGINT) AS cents,
        |    ('0x' || substring(md5('ro:' || CAST(event_id AS VARCHAR)), 1, 8))::BIGINT AS ok,
        |    CAST(FLOOR(value * 100) AS BIGINT) * 8589934592
        |      + ('0x' || substring(md5('rv:' || CAST(event_id AS VARCHAR)), 1, 8))::BIGINT AS x
        |  FROM events),
        |r AS (SELECT event_type, x,
        |    MAX(x) OVER (PARTITION BY event_type ORDER BY ok
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS rm
        |  FROM e),
        |g AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(CASE WHEN rm IS NULL OR x > rm THEN 1 ELSE 0 END) AS BIGINT) AS records
        |  FROM r GROUP BY 1),
        |idx AS (SELECT CAST(ROW_NUMBER() OVER () AS BIGINT) AS i FROM events),
        |h AS (SELECT event_type, CAST(SUM(1000000 // idx.i) AS BIGINT) AS e_micro
        |  FROM g JOIN idx ON idx.i <= g.n
        |  GROUP BY 1)
        |SELECT g.event_type, n, records, e_micro,
        |  CAST(records * 1000000 - e_micro AS HUGEINT) * (records * 1000000 - e_micro)
        |    < CAST(9 AS HUGEINT) * e_micro * 1000000 AS within_3sigma
        |FROM g JOIN h ON g.event_type = h.event_type
        |ORDER BY g.event_type""".stripMargin,

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
