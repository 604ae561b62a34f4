package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Round-13 operators, second compilation unit (waves 16+) — continues the
  * north-star surfaces: LLM-eval arena ranking, service idempotency, person
  * identity-document validation. Same paired impl/oracle style and engine-
  * exactness laws as Round13Ops: money in integer cents, rates in ppm,
  * DECIMAL(38,0)/HUGEINT for wide products, integer DIV on the same
  * positive operands in both engines.
  */
object Round13bOps {
  type Q = (SparkSession, String) => DataFrame

  /** ICAO 9303 check digit over a 9-char MRZ field: value(c)·w cycled
    * 7,3,1, mod 10. Shared by the impl (Spark SQL fragment) so the
    * issuance and validation sides use the identical formula.
    */
  private def mrzCd(field: String): String =
    s"""aggregate(sequence(1, 9), 0, (acc, i) -> acc +
       |  (CASE WHEN substring($field, i, 1) = '<' THEN 0
       |        WHEN substring($field, i, 1) BETWEEN '0' AND '9'
       |          THEN ascii(substring($field, i, 1)) - 48
       |        ELSE ascii(substring($field, i, 1)) - 55 END)
       |  * element_at(array(7, 3, 1), ((i - 1) % 3) + 1)) % 10""".stripMargin

  val queries: Map[String, Q] = Map(
    // Bradley–Terry arena ranking — the LLM-eval leaderboard fit (Chatbot-
    // Arena style): pairwise battles between 6 models, winner drawn by the
    // exact Bradley–Terry generative law (event_id % (s_a+s_b) < s_a with
    // planted strengths s_i = i+1), then TWO minorization-maximization
    // iterations p_i ← W_i / Σ_j n_ij/(p_i+p_j) carried out ENTIRELY in
    // integer ppm (per-edge BIGINT DIV, association-order free — both
    // engines replay the identical arithmetic, no float drift). The only
    // data-scaled work is one groupBy over the battle log; the MM solve
    // runs on the bounded 6-model/15-pair table (auto-broadcast joins), so
    // the shape is one shuffle at any corpus size. Graded per model:
    // battles, wins, fitted strength (ppm) and rank — the planted order
    // 5..0 must come back.
    "agg_bradley_terry" -> ((s, d) => {
      val battles = Tables.events(s, d)
        .select((col("user_id") % 6).as("a"),
          (expr("user_id DIV 7") % 6).as("b"), col("event_id"))
        .where(col("a") =!= col("b"))
        .withColumn("winner",
          when(col("event_id") % (col("a") + col("b") + 2) < col("a") + 1,
            col("a")).otherwise(col("b")))
      val pairs = battles
        .groupBy(least(col("a"), col("b")).as("i"),
          greatest(col("a"), col("b")).as("j"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("winner") === least(col("a"), col("b")), 1L)
            .otherwise(0L)).as("wi"))
        .localCheckpoint() // bounded 15 rows; cut the lineage for the 4 reuses
      val edges = pairs.select(col("i").as("m"), col("j").as("o"), col("n"))
        .unionByName(pairs.select(col("j").as("m"), col("i").as("o"), col("n")))
      val base = pairs.select(col("i").as("m"), col("wi").as("w"), col("n"))
        .unionByName(pairs.select(col("j").as("m"), (col("n") - col("wi")).as("w"), col("n")))
        .groupBy("m").agg(sum("w").as("wins"), sum("n").as("battles"))
      def mmStep(p: DataFrame): DataFrame = {
        val d2 = edges
          .join(p.select(col("m"), col("p").as("pm")), Seq("m"))
          .join(p.select(col("m").as("o"), col("p").as("po")), Seq("o"))
          .select(col("m"),
            // n*1e12 overflows Long at ~9.2M battles/pair — route the wide
            // product through DECIMAL(38,0) (HUGEINT twin in the oracle).
            expr("(CAST(n AS DECIMAL(38,0)) * 1000000000000) DIV (pm + po)").as("term"))
          .groupBy("m").agg(sum("term").as("denom"))
        base.join(d2, Seq("m"))
          .select(col("m"),
            expr("(CAST(wins AS DECIMAL(38,0)) * 1000000000000) DIV denom").as("p"))
      }
      val p1 = mmStep(base.select(col("m"), lit(1000000L).as("p")))
      val p2 = mmStep(p1)
      base.join(p2, Seq("m"))
        .select(col("m").as("model"), col("battles"), col("wins"),
          col("p").as("strength_ppm"))
        .withColumn("rank", row_number().over(
          Window.orderBy(col("strength_ppm").desc, col("model"))))
        .orderBy("model")
    }),

    // Idempotency-key replay audit — the at-most-once bookkeeping every
    // payment/request API runs: clients retry with the SAME idempotency
    // key (planted: event ids ≡ 3,4,5 mod 7 share the key of the ≡3 id —
    // triple-attempt keys at a known 1-in-7 key rate), the service must
    // census the replay tax. Per principal: attempts vs distinct keys,
    // replayed keys, the wasted-attempt mass, worst attempt fan-out and
    // the widest first→last replay window (the dedup-cache TTL this
    // measures). Two shuffles (key rollup, then principal rollup) at any
    // scale; the window math is exact µs integers.
    "service_idempotency_replay" -> ((s, d) => {
      Tables.events(s, d)
        .select(col("event_id"), col("ts_us"))
        .withColumn("idem_key", col("event_id") -
          when(col("event_id") % 7 === 4, 1L)
            .when(col("event_id") % 7 === 5, 2L).otherwise(0L))
        .groupBy("idem_key")
        .agg(count(lit(1)).as("attempts"),
          (max("ts_us") - min("ts_us")).as("span_us"))
        .groupBy((col("idem_key") % 8).as("principal"))
        .agg(sum("attempts").as("n_attempts"),
          count(lit(1)).as("n_keys"),
          sum(when(col("attempts") >= 2, 1L).otherwise(0L)).as("n_replayed"),
          max("attempts").as("max_attempts"),
          max("span_us").as("max_replay_window_us"))
        .withColumn("wasted_attempts", col("n_attempts") - col("n_keys"))
        .withColumn("replay_ppm",
          expr("(n_replayed * 1000000) DIV n_keys"))
        .orderBy("principal")
    }),

    // Passport MRZ check-digit validation (ICAO 9303) — the identity-
    // document gate a person service runs at onboarding: the 9-char
    // document number's check digit is the 7-3-1 weighted sum mod 10
    // over the 0-9/A-Z/< value alphabet. Issuance computes the digit
    // from the true number; presentation corrupts one char for every
    // custkey ≡ 7 mod 11 (a +1 alphabet shift at position 5, weight 3 —
    // provably never check-neutral since 3·δ ≢ 0 mod 10 for δ ∈
    // {1,-9,-5}); validation recomputes from the PRESENTED chars. The
    // per-row work is a constant 9-step fold (codegen'd higher-order
    // aggregate, no UDF); census per market segment: documents, failed
    // checks (exactly the planted corruption class), failure ppm, and
    // the carried-digit sum as a checksum-of-checksums.
    "fn_mrz_check" -> ((s, d) => {
      Tables.customer(s, d)
        .select(col("c_custkey"), col("c_mktsegment"))
        .withColumn("doc_no",
          upper(expr("substring(md5(CAST(c_custkey AS STRING)), 1, 9)")))
        .withColumn("carried_cd", expr(mrzCd("doc_no")))
        .withColumn("presented",
          when(col("c_custkey") % 11 === 7,
            expr("""concat(substring(doc_no, 1, 4),
                   |  CASE WHEN substring(doc_no, 5, 1) = '9' THEN '0'
                   |       WHEN substring(doc_no, 5, 1) = 'F' THEN 'A'
                   |       ELSE chr(ascii(substring(doc_no, 5, 1)) + 1) END,
                   |  substring(doc_no, 6, 4))""".stripMargin))
            .otherwise(col("doc_no")))
        .withColumn("recomputed_cd", expr(mrzCd("presented")))
        .withColumn("valid", col("recomputed_cd") === col("carried_cd"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(!col("valid"), 1L).otherwise(0L)).as("n_failed"),
          sum("carried_cd").as("carried_cd_sum"))
        .withColumn("fail_ppm", expr("(n_failed * 1000000) DIV n_docs"))
        .orderBy("c_mktsegment")
    }),

    // Population Stability Index — the model-monitoring drift gate (the
    // score-distribution sibling of agg_ks_drift): baseline vs current
    // populations split by user parity, a planted +80 score shift on two
    // event types in the current half (two full bins of drift — the
    // undrifted types stay near zero). PSI = Σ (p_c − p_b)·ln(p_c/p_b)
    // over 10 equal-width bins, each bin's term rounded to integer
    // micro-units BEFORE the sum (association-order free, the
    // agg_entropy exactness law); bins empty on either side are skipped
    // under the same rule in both engines and censused. Every term is
    // mathematically ≥ 0, so the sum is a true divergence. One shuffle
    // to the (type, bin) grid, then a bounded window + rollup.
    "agg_psi_stability" -> ((s, d) => {
      Tables.events(s, d)
        .select(col("event_type"), (col("user_id") % 2).as("period"),
          (col("value") + when(col("user_id") % 2 === 1 &&
            col("event_type").isin("error", "purchase"), 80.0)
            .otherwise(0.0)).as("score"))
        .withColumn("bin", least(floor(col("score") / 40).cast("int"), lit(9)))
        .groupBy("event_type", "bin")
        .agg(sum(when(col("period") === 0, 1L).otherwise(0L)).as("b"),
          sum(when(col("period") === 1, 1L).otherwise(0L)).as("c"))
        .withColumn("bt", sum("b").over(Window.partitionBy("event_type")))
        .withColumn("ct", sum("c").over(Window.partitionBy("event_type")))
        .withColumn("term_micro",
          when(col("b") > 0 && col("c") > 0, expr(
            """CAST(round((CAST(c AS DOUBLE) / ct - CAST(b AS DOUBLE) / bt)
              |  * ln((CAST(c AS DOUBLE) * bt) / (CAST(b AS DOUBLE) * ct)) * 1000000) AS BIGINT)"""
              .stripMargin)).otherwise(lit(0L)))
        .groupBy("event_type")
        .agg(max("bt").as("base_n"), max("ct").as("cur_n"),
          sum(when(col("b") > 0 && col("c") > 0, 1L).otherwise(0L)).as("bins_used"),
          sum("term_micro").as("psi_micro"))
        .withColumn("drift", col("psi_micro") >= 200000L)
        .orderBy("event_type")
    }),

    // Circuit breaker — the request-indexed failure guard (time-window
    // breakers starve on sparse traffic; production breakers count the
    // trailing N calls): per service the last-20-requests failure count
    // in the (ts_us, event_id) total order, OPEN at ≥ 8/20. Failures =
    // error events plus planted dependency-outage blocks (every 13th
    // 50-event id block fails wholesale — dense runs that provably trip
    // the breaker at any scale). Trip episodes = gaps-and-islands over
    // the open flag; census per service: requests, open requests, trips,
    // longest open run, worst window pressure. Two stacked windows + two
    // rollups, all partitioned by service — no global sort at any scale.
    "service_circuit_breaker" -> ((s, d) => {
      val w20 = Window.partitionBy("service").orderBy("ts_us", "event_id")
        .rowsBetween(-19, 0)
      val wSeq = Window.partitionBy("service").orderBy("ts_us", "event_id")
      val wOpen = Window.partitionBy("service", "open").orderBy("ts_us", "event_id")
      val flagged = Tables.events(s, d)
        .select((col("user_id") % 4).as("service"), col("event_id"),
          col("ts_us"), col("event_type"))
        .withColumn("fail", when(col("event_type") === "error" ||
          expr("event_id DIV 50") % 13 === 7, 1L).otherwise(0L))
        .withColumn("werr", sum("fail").over(w20))
        .withColumn("open", (col("werr") >= 8L).cast("int"))
        .withColumn("island",
          row_number().over(wSeq) - row_number().over(wOpen))
      val runs = flagged.where(col("open") === 1)
        .groupBy("service", "island")
        .agg(count(lit(1)).as("run_len"))
        .groupBy("service")
        .agg(count(lit(1)).as("n_trips"), max("run_len").as("longest_open_run"))
      flagged.groupBy("service")
        .agg(count(lit(1)).as("n_requests"),
          sum("open").as("open_requests"),
          max("werr").as("max_window_fails"))
        .join(runs, Seq("service"), "left")
        .na.fill(0L, Seq("n_trips", "longest_open_run"))
        .orderBy("service")
    }),

    // RAG context packing under a token budget — the inference-side
    // sibling of llm_concat_packing (which packs TRAINING sequences):
    // per query, candidate passages ranked by relevance, greedily packed
    // in rank order until the 256-token context budget closes. The
    // fixture's 64 queries × md5 relevance (top-10% filter) stand in for
    // an ANN candidate stage — the broadcast cross join SCORES 64× the doc
    // mass (that is the evaluated volume); the score≥900 filter then prunes
    // the surviving candidates to a fixed 6.4× before the window. Both are
    // linear in corpus size; the pack itself is one per-query
    // running sum (never a knapsack solve — rank-greedy is what serving
    // stacks run). Census per query bucket: packed passages, packed
    // tokens, boundary casualties (the first passage that no longer
    // fit), budget utilization ppm.
    "llm_rag_budget_pack" -> ((s, d) => {
      val q = s.range(64).select(col("id").as("q"))
      val wPack = Window.partitionBy("q")
        .orderBy(col("score").desc, col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.documents(s, d).select(col("doc_id"), col("n_chars"))
        .crossJoin(broadcast(q))
        .withColumn("score", expr(
          """CAST(conv(substring(md5(concat(CAST(q AS STRING), ':',
            |  CAST(doc_id AS STRING))), 1, 6), 16, 10) AS BIGINT) % 1000"""
            .stripMargin))
        .where(col("score") >= 900)
        .withColumn("tok", expr("n_chars DIV 4"))
        .withColumn("cumtok", sum("tok").over(wPack))
        .groupBy((col("q") % 8).as("q_bucket"))
        .agg(countDistinct("q").as("n_queries"),
          sum(when(col("cumtok") <= 256, 1L).otherwise(0L)).as("n_packed"),
          sum(when(col("cumtok") <= 256, col("tok")).otherwise(0L)).as("packed_tokens"),
          sum(when(col("cumtok") > 256 && col("cumtok") - col("tok") <= 256, 1L)
            .otherwise(0L)).as("boundary_dropped"))
        .withColumn("util_ppm",
          expr("(packed_tokens * 1000000) DIV (n_queries * 256)"))
        .orderBy("q_bucket")
    }),

    // Retry-storm / backoff-discipline audit — the client-behavior twin
    // of service_idempotency_replay (which counts replays; this one
    // judges their TIMING): the request log viewed as 4-attempt retry
    // chains, inter-attempt gaps from the (ts_us, event_id) total order,
    // a chain VIOLATES exponential-backoff discipline when any later gap
    // shrinks below its predecessor (the thundering-herd signature an
    // SRE pages on). Per service: chains, attempts, amplification ppm,
    // violating chains + ppm, and the tightest observed retry gap (the
    // µs burst floor). Two stacked lags inside one chain window + two
    // rollups; everything partitioned by chain then service.
    "service_retry_storm" -> ((s, d) => {
      val wc = Window.partitionBy("chain").orderBy("ts_us", "event_id")
      val chains = Tables.events(s, d)
        .select(col("event_id"), col("ts_us"))
        .withColumn("chain", expr("event_id DIV 4"))
        .withColumn("gap", col("ts_us") - lag("ts_us", 1).over(wc))
        .withColumn("shrunk",
          when(col("gap") < lag("gap", 1).over(wc), 1L).otherwise(0L))
        .groupBy("chain")
        .agg(count(lit(1)).as("attempts"), max("shrunk").as("viol"),
          min("gap").as("min_gap"))
      chains.groupBy((col("chain") % 4).as("service"))
        .agg(count(lit(1)).as("n_chains"), sum("attempts").as("n_attempts"),
          sum("viol").as("violating_chains"),
          min("min_gap").as("min_gap_us"))
        .withColumn("amplification_ppm",
          expr("(n_attempts * 1000000) DIV n_chains"))
        .withColumn("violation_ppm",
          expr("(violating_chains * 1000000) DIV n_chains"))
        .orderBy("service")
    }),

    // Word-error-rate eval by token fingerprinting — mm_asr_cer_eval's
    // word-level sibling: the reference's first 12 words are ENCODED one
    // char per word (md5 fingerprint → A-Z; collisions are the declared
    // approximation both engines share bit-for-bit), so word-level edit
    // distance reduces to the same constant-bounded Levenshtein DP the
    // CER op runs — a 12² ceiling per row, linear in docs at any scale.
    // Hypothesis corruptions per class: every 3rd word dropped (regex
    // group surgery on the encoding), leading word swap, clean. Graded
    // per (source, class): docs, WER-ppm mass, worst WER.
    "llm_wer_eval" -> ((s, d) => {
      Tables.documents(s, d)
        .select(col("doc_id"), col("source"),
          expr("""array_join(transform(slice(split(text, ' '), 1, 12),
                 |  w -> chr(65 + CAST(conv(substring(md5(w), 1, 4), 16, 10)
                 |           AS BIGINT) % 26)), '')""".stripMargin).as("enc"),
          expr("least(size(split(text, ' ')), 12)").as("n_words"))
        .withColumn("class",
          when(col("doc_id") % 3 === 0, lit("drop3"))
            .when(col("doc_id") % 3 === 1, lit("swap")).otherwise(lit("clean")))
        .withColumn("hyp",
          when(col("class") === "drop3",
            regexp_replace(col("enc"), "(..).", "$1"))
            .when(col("class") === "swap" && length(col("enc")) >= 2,
              expr("concat(substring(enc, 2, 1), substring(enc, 1, 1), substring(enc, 3))"))
            .otherwise(col("enc")))
        .withColumn("wer_ppm", expr(
          "(levenshtein(enc, hyp) * CAST(1000000 AS BIGINT)) DIV n_words"))
        .groupBy("source", "class")
        .agg(count(lit(1)).as("n_docs"), sum("wer_ppm").as("wer_ppm_mass"),
          max("wer_ppm").as("worst_wer_ppm"))
        .orderBy("source", "class")
    }),

    // Stable keyed pseudonymization — the GDPR-grade tokenization every
    // person warehouse ships (warehouse_masked_view hides columns; this
    // op REPLACES the join key and must prove referential integrity
    // survives): pseudo = keyed md5 prefix of the customer key, applied
    // independently to the customer dim and the orders fact, then the
    // fact re-joined to the dim ON THE PSEUDONYM. Graded per segment:
    // customers vs distinct pseudonyms and the max keys-per-pseudonym
    // (the collision census — 48 bits keeps it 1:1 at any graded scale),
    // plus the order count and cents mass that survive the pseudonym
    // join. One shuffle join on the pseudonym + two rollups.
    "warehouse_pseudonym_consistent" -> ((s, d) => {
      def pseudo(key: String) = expr(
        s"upper(substring(md5(concat('pepper2024:', CAST($key AS STRING))), 1, 12))")
      val cust = Tables.customer(s, d)
        .select(col("c_custkey"), col("c_mktsegment"), pseudo("c_custkey").as("pseudo"))
      val perPseudo = cust.groupBy("c_mktsegment", "pseudo")
        .agg(count(lit(1)).as("keys"))
        .groupBy("c_mktsegment")
        .agg(sum("keys").as("n_customers"), count(lit(1)).as("n_pseudonyms"),
          max("keys").as("max_keys_per_pseudo"))
      val ordSide = Tables.orders(s, d)
        .select(pseudo("o_custkey").as("pseudo"), col("o_totalprice"))
        .join(cust.select("pseudo", "c_mktsegment"), Seq("pseudo"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_orders"),
          sum(expr("CAST(FLOOR(o_totalprice * 100) AS BIGINT)")).as("order_cents"))
      perPseudo.join(ordSide, Seq("c_mktsegment"))
        .orderBy("c_mktsegment")
    }),

    // Impossible-travel detection — the account-takeover heuristic every
    // person-service security team runs: each login resolves to a city
    // grid cell (home cell per user; planted md5 trips relocate every
    // 17th event), consecutive logins per user in the (ts_us, event_id)
    // total order yield a Chebyshev grid distance and an EXACT integer
    // speed (units·3600e6 DIV Δµs — no haversine floats to drift), a
    // transition is IMPOSSIBLE above 900 units/h. Per principal bucket:
    // transitions, relocations, impossible count + ppm, worst observed
    // speed. One user-partitioned lag window + one rollup.
    "service_impossible_travel" -> ((s, d) => {
      val wu = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
      Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("ts_us"))
        .withColumn("city",
          when(col("event_id") % 17 === 3, col("event_id") % 20)
            .otherwise(col("user_id") % 20))
        .withColumn("x", (col("city") % 5) * 1000)
        .withColumn("y", expr("city DIV 5") * 1000)
        .withColumn("dist", greatest(
          abs(col("x") - lag("x", 1).over(wu)),
          abs(col("y") - lag("y", 1).over(wu))))
        .withColumn("dt_us",
          greatest(col("ts_us") - lag("ts_us", 1).over(wu), lit(1L)))
        .withColumn("speed", expr("(dist * 3600000000) DIV dt_us"))
        .where(col("dist").isNotNull)
        .groupBy((col("user_id") % 8).as("principal"))
        .agg(count(lit(1)).as("n_transitions"),
          sum(when(col("dist") > 0, 1L).otherwise(0L)).as("n_moves"),
          sum(when(col("speed") > 900L, 1L).otherwise(0L)).as("n_impossible"),
          max("speed").as("max_speed"))
        .withColumn("impossible_ppm",
          expr("(n_impossible * 1000000) DIV n_transitions"))
        .orderBy("principal")
    }),

    // Subtitle-to-speech alignment — the mm tier's interval-join QA: even
    // events are SPEECH segments, odd events are subtitle CUES (duration
    // = value·10⁴ µs, up to ~3.3 s), both per session (user). Candidate
    // pairs are BLOCKED on the (user, start-hour) cell — the declared
    // alignment window every subtitle QA tool uses; pairs straddling an
    // hour boundary are out of scope by that rule in BOTH engines, and
    // the cell population is bounded (traffic/hour), so the join is
    // linear at any scale, never |cues|×|segments|. A cue is MATCHED if
    // any segment overlaps it, ALIGNED if some segment covers ≥ half of
    // it (exact integer µs overlap). Per principal bucket: cues, matched,
    // aligned, orphans, total overlap mass.
    "mm_subtitle_align" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("ts_us"),
          expr("CAST(FLOOR(value * 10000) AS BIGINT)").as("dur_us"))
        .withColumn("hour", expr("ts_us DIV 3600000000"))
      val segs = ev.where(col("event_id") % 2 === 0)
        .select(col("user_id"), col("hour"), col("ts_us").as("s_start"),
          (col("ts_us") + col("dur_us")).as("s_end"))
      val cues = ev.where(col("event_id") % 2 === 1)
        .select(col("user_id"), col("hour"), col("event_id").as("cue_id"),
          col("ts_us").as("c_start"), (col("ts_us") + col("dur_us")).as("c_end"))
      val perCue = cues.join(segs, Seq("user_id", "hour"), "left")
        .withColumn("overlap", greatest(
          least(col("c_end"), col("s_end")) -
            greatest(col("c_start"), col("s_start")), lit(0L)))
        .groupBy(col("user_id"), col("cue_id"),
          (col("c_end") - col("c_start")).as("c_dur"))
        .agg(sum(when(col("overlap") > 0, 1L).otherwise(0L)).as("n_overlapping"),
          max(coalesce(col("overlap"), lit(0L))).as("best_overlap"),
          sum(coalesce(col("overlap"), lit(0L))).as("overlap_mass"))
      perCue.groupBy((col("user_id") % 8).as("principal"))
        .agg(count(lit(1)).as("n_cues"),
          sum(when(col("n_overlapping") > 0, 1L).otherwise(0L)).as("matched_cues"),
          sum(when(col("best_overlap") * 2 >= col("c_dur"), 1L).otherwise(0L))
            .as("aligned_cues"),
          sum(when(col("n_overlapping") === 0, 1L).otherwise(0L)).as("orphan_cues"),
          sum("overlap_mass").as("overlap_mass_us"))
        .orderBy("principal")
    }),

    // Crawl-frontier scheduling — the politeness-budgeted fetch plan a
    // web-corpus pipeline runs upstream of everything else: URLs (docs)
    // grouped by host (source × md5 shard), ranked inside each host by
    // (priority desc, doc_id), and drained at ≤ 2 fetches per host per
    // round (the crawl-delay law), so a URL's round = (host-rank−1) DIV 2.
    // Per source: URLs, hosts, rounds-to-drain (frontier latency), the
    // round-0 share — the scheduling telemetry that decides crawler
    // capacity. One host-partitioned rank window + one rollup; hosts
    // scale with the corpus so no partition ever exceeds its own host's
    // URL count.
    "llm_crawl_frontier_plan" -> ((s, d) => {
      val wh = Window.partitionBy("host").orderBy(col("prio").desc, col("doc_id"))
      Tables.documents(s, d)
        .select(col("doc_id"), col("source"))
        .withColumn("host", concat(col("source"), lit("-"),
          (col("doc_id") % 50).cast("string")))
        .withColumn("prio", expr(
          "CAST(conv(substring(md5(concat('url:', CAST(doc_id AS STRING))), 1, 6), 16, 10) AS BIGINT) % 1000"))
        .withColumn("rn", row_number().over(wh))
        .withColumn("round", expr("(CAST(rn AS BIGINT) - 1) DIV 2"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_urls"),
          countDistinct("host").as("n_hosts"),
          (max("round") + 1).as("rounds_to_drain"),
          sum(when(col("round") === 0, 1L).otherwise(0L)).as("round0_urls"))
        .withColumn("round0_share_ppm",
          expr("(round0_urls * 1000000) DIV n_urls"))
        .orderBy("source")
    }),

    // MoE router load-balance audit — the expert-parallel training
    // telemetry (a skewed router starves experts and blows the all-to-all
    // step): tokens route top-2 over 16 experts per layer (md5 gates; the
    // second choice re-indexed past the first so the pair is always
    // distinct — the standard distinct-sampling trick). Per layer the
    // exact integer balance factor n_experts·Σload² ·1e6 DIV (Σload)² —
    // EXACTLY 1e6 when perfectly balanced, growing with skew (the L2
    // imbalance every MoE paper reports), plus max-load ppm and the
    // expert census. One shuffle to (layer, expert), bounded rollups.
    "llm_moe_router_balance" -> ((s, d) => {
      val routed = Tables.events(s, d)
        .select(col("event_id"), (col("event_id") % 4).as("layer"))
        .withColumn("e1", expr(
          "CAST(conv(substring(md5(concat('e1:', CAST(event_id AS STRING))), 1, 6), 16, 10) AS BIGINT) % 16"))
        .withColumn("e2r", expr(
          "CAST(conv(substring(md5(concat('e2:', CAST(event_id AS STRING))), 1, 6), 16, 10) AS BIGINT) % 15"))
        .withColumn("e2", when(col("e2r") >= col("e1"), col("e2r") + 1)
          .otherwise(col("e2r")))
      val loads = routed.select(col("layer"), col("e1").as("expert"))
        .unionByName(routed.select(col("layer"), col("e2").as("expert")))
        .groupBy("layer", "expert")
        .agg(count(lit(1)).as("load"))
      loads.groupBy("layer")
        .agg(sum("load").as("n_assignments"),
          count(lit(1)).as("experts_used"),
          max("load").as("max_load"),
          sum(col("load") * col("load")).as("l2"))
        .select(col("layer"),
          expr("n_assignments DIV 2").as("n_tokens"),
          col("n_assignments"), col("experts_used"),
          expr("(max_load * 1000000) DIV n_assignments").as("max_load_ppm"),
          // DECIMAL(38,0) product chain: l2 ~ n^2/16, so 16*l2*1e6 overflows
          // Long near ~3M assignments/layer — route through decimal exactly
          // as service_composite_slo does (HUGEINT on the DuckDB side).
          expr("""CAST((CAST(16 AS DECIMAL(38,0)) * l2 * 1000000)
                 |  DIV (CAST(n_assignments AS DECIMAL(38,0)) * n_assignments)
                 |  AS BIGINT)""".stripMargin)
            .as("balance_factor_ppm"))
        .orderBy("layer")
    }),

    // Temporal frame dedup — the video-preprocessing pass that drops
    // near-identical consecutive frames BEFORE any decode/embedding cost:
    // frames (events per session) carry a 60-bit perceptual hash that is
    // stable within a 5-frame SHOT (planted: same md5 base XOR a ≤2-bit
    // jitter; shots keyed by frame sequence, not wall-clock, so the plant
    // holds at sparse and dense traffic alike) and random across shots; a
    // frame is DROPPED when its Hamming distance to the PREDECESSOR is
    // ≤ 4 (lag-1 greedy — the streaming-friendly rule, one window, no
    // pairwise). bit_count(xor) is codegen'd in both engines. Per
    // principal: frames, dropped, kept, drop ppm — the decode-cost
    // saving this pass buys.
    "mm_frame_dedup_temporal" -> ((s, d) => {
      val wu = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
      Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("ts_us"))
        .withColumn("shot", expr("(CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS BIGINT) - 1) DIV 5"))
        .withColumn("phash", expr(
          """CAST(conv(substring(md5(concat('ph:', CAST(user_id AS STRING), ':',
            |  CAST(shot AS STRING))), 1, 15), 16, 10) AS BIGINT)"""
            .stripMargin).bitwiseXOR(col("event_id") % 3))
        .withColumn("prev", lag("phash", 1).over(wu))
        .withColumn("dropped", when(col("prev").isNotNull &&
          bit_count(col("phash").bitwiseXOR(col("prev"))) <= 4, 1L).otherwise(0L))
        .groupBy((col("user_id") % 8).as("principal"))
        .agg(count(lit(1)).as("n_frames"), sum("dropped").as("n_dropped"))
        .withColumn("n_kept", col("n_frames") - col("n_dropped"))
        .withColumn("drop_ppm", expr("(n_dropped * 1000000) DIV n_frames"))
        .orderBy("principal")
    }),

    // Semantic-version ordering — the deployment-ledger gate that
    // lexicographic MAX silently corrupts (v2.9.9 > v2.9.19 as strings):
    // component versions rendered as strings, re-PARSED by anchored
    // regexp_extract (the fn surface under test), latest picked by
    // max_by on the exact numeric key, and the lexicographic answer
    // carried beside it with a divergence flag — the proof the numeric
    // path matters. One rollup per component.
    "fn_semver_latest" -> ((s, d) => {
      Tables.orders(s, d)
        .select((col("o_orderkey") % 12).as("component"),
          concat(lit("v"), (col("o_orderkey") % 3).cast("string"), lit("."),
            (expr("o_orderkey DIV 3") % 10).cast("string"), lit("."),
            (expr("o_orderkey DIV 30") % 20).cast("string")).as("version"))
        .withColumn("maj", regexp_extract(col("version"),
          "^v(\\d+)\\.(\\d+)\\.(\\d+)$", 1).cast("bigint"))
        .withColumn("min_", regexp_extract(col("version"),
          "^v(\\d+)\\.(\\d+)\\.(\\d+)$", 2).cast("bigint"))
        .withColumn("pat", regexp_extract(col("version"),
          "^v(\\d+)\\.(\\d+)\\.(\\d+)$", 3).cast("bigint"))
        .withColumn("numkey",
          col("maj") * 1000000L + col("min_") * 1000L + col("pat"))
        .groupBy("component")
        .agg(count(lit(1)).as("n_versions"),
          countDistinct("version").as("n_distinct_versions"),
          expr("max_by(version, numkey)").as("latest_semver"),
          max("version").as("lex_max"))
        .withColumn("lex_wrong", col("latest_semver") =!= col("lex_max"))
        .orderBy("component")
    }),

    // Retention vs legal-hold conflict audit — the governance collision
    // every DPO adjudicates: the TTL policy says DELETE (order older than
    // the per-segment retention horizon, measured against the corpus
    // high-water mark so the audit replays exactly), the litigation-hold
    // ledger says KEEP (planted: every custkey ≡ 5 mod 23 is under
    // hold). The sweep may only remove EXPIRED ∧ ¬HELD; conflicted rows
    // (expired ∧ held) go to the review queue. Per segment: rows,
    // expired, held, conflicts, deletable, and the deletable cents mass
    // leaving the warehouse. Broadcast horizon + one rollup.
    "warehouse_retention_legal_hold" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val hwm = o.agg(max("o_orderdate").as("hwm"))
      o.select(col("o_custkey"), col("o_orderdate"), col("o_totalprice"))
        .join(Tables.customer(s, d).select(col("c_custkey"), col("c_mktsegment")),
          col("o_custkey") === col("c_custkey"))
        .crossJoin(broadcast(hwm))
        .withColumn("horizon_days",
          when(col("c_mktsegment").isin("BUILDING", "MACHINERY"), 365)
            .otherwise(540))
        .withColumn("expired",
          datediff(col("hwm"), col("o_orderdate")) > col("horizon_days"))
        .withColumn("held", col("o_custkey") % 23 === 5)
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_orders"),
          sum(when(col("expired"), 1L).otherwise(0L)).as("n_expired"),
          sum(when(col("held"), 1L).otherwise(0L)).as("n_held"),
          sum(when(col("expired") && col("held"), 1L).otherwise(0L)).as("n_conflicts"),
          sum(when(col("expired") && !col("held"), 1L).otherwise(0L)).as("n_deletable"),
          sum(when(col("expired") && !col("held"),
            expr("CAST(FLOOR(o_totalprice * 100) AS BIGINT)")).otherwise(0L))
            .as("deletable_cents"))
        .orderBy("c_mktsegment")
    }),

    // API version adoption / deprecation readiness — the service-owner
    // dashboard before turning an endpoint off: calls carry an API
    // version (md5-assigned: a 0.5% ancient v0 — under the 1% bar, so
    // READY — and an 8% legacy v1 that is not), graded per (version,
    // week): call share in exact ppm via the week-total broadcast, plus
    // per version the last active week and the READY flag — share over
    // the TRAILING 4 WEEKS < 1% (a single final week is too small a
    // sample to turn an endpoint off on; the trailing window is the
    // production rule). Two rollups + broadcast joins — no windows over
    // the raw log.
    "service_api_version_adoption" -> ((s, d) => {
      val calls = Tables.events(s, d)
        .select(expr("ts_us DIV 604800000000").as("week"),
          expr("""CASE WHEN CAST(conv(substring(md5(concat('ver:',
                 |  CAST(event_id AS STRING))), 1, 6), 16, 10) AS BIGINT) % 1000 < 5
                 |THEN 'v0'
                 |WHEN CAST(conv(substring(md5(concat('ver:',
                 |  CAST(event_id AS STRING))), 1, 6), 16, 10) AS BIGINT) % 1000 < 85
                 |THEN 'v1' ELSE 'v2' END""".stripMargin).as("version"))
      val perWeek = calls.groupBy("week", "version")
        .agg(count(lit(1)).as("calls"))
      val weekTot = perWeek.groupBy("week").agg(sum("calls").as("week_calls"))
      val lastWeek = weekTot.agg(max("week").as("final_week"))
      val trailTot = weekTot.crossJoin(broadcast(lastWeek))
        .where(col("week") > col("final_week") - 4)
        .agg(sum("week_calls").as("trail_total"))
      perWeek.join(broadcast(weekTot), Seq("week"))
        .withColumn("share_ppm", expr("(calls * 1000000) DIV week_calls"))
        .crossJoin(broadcast(lastWeek))
        .groupBy("version")
        .agg(sum("calls").as("total_calls"),
          count(lit(1)).as("active_weeks"),
          max("week").as("last_active_week"),
          expr("max_by(share_ppm, week)").as("final_week_share_ppm"),
          sum(when(col("week") > col("final_week") - 4, col("calls"))
            .otherwise(0L)).as("trailing4w_calls"))
        .crossJoin(broadcast(trailTot))
        .withColumn("trailing4w_share_ppm",
          expr("(trailing4w_calls * 1000000) DIV trail_total"))
        .withColumn("deprecation_ready", col("trailing4w_share_ppm") < 10000L)
        .select("version", "total_calls", "active_weeks", "last_active_week",
          "final_week_share_ppm", "trailing4w_calls", "trailing4w_share_ppm",
          "deprecation_ready")
        .orderBy("version")
    }),

    // Teacher–student distillation agreement — the eval gate before a
    // distilled model ships: teacher labels from the embeddings table,
    // student predictions planted to flip every vec_id ≡ 2 mod 9 to the
    // next class (a known ~11% disagreement mass). Per teacher class:
    // support, agreements, exact agreement ppm, and the dominant
    // confusion target via max_by over the off-diagonal census — the
    // per-class error anatomy a distillation run is judged on. Two
    // bounded rollups after one scan.
    "llm_distill_agreement" -> ((s, d) => {
      val k = 8 // embeddings.label classes are bounded; fold into 8
      val preds = Tables.embeddings(s, d)
        .select(col("vec_id"), (col("label") % k).as("teacher"))
        .withColumn("student",
          when(col("vec_id") % 9 === 2, (col("teacher") + 1) % k)
            .otherwise(col("teacher")))
      val confusion = preds.groupBy("teacher", "student")
        .agg(count(lit(1)).as("n"))
      confusion.groupBy("teacher")
        .agg(sum("n").as("support"),
          sum(when(col("student") === col("teacher"), col("n")).otherwise(0L))
            .as("agreements"),
          expr("max_by(student, CASE WHEN student = teacher THEN -1 ELSE n END)")
            .as("top_confusion"))
        .withColumn("agreement_ppm",
          expr("(agreements * 1000000) DIV support"))
        .orderBy("teacher")
    }),

    // Schema-registry compatibility matrix — the evolution gate between
    // consecutive schema versions (source_schema_evolution reads the
    // DATA; this op grades the REGISTRY rules that decide whether a
    // version may ship at all): 8 versions over a 15-field universe,
    // each version widening by one field per two versions and dropping
    // one planted field from v5 on; field i is REQUIRED iff i % 3 ≠ 0.
    // BACKWARD compatible (new reader, old data) ⇔ nothing REQUIRED was
    // added; FORWARD (old reader, new data) ⇔ nothing REQUIRED was
    // dropped. Set-diffs via one full-outer join per consecutive pair —
    // registry-scale metadata, the engine shape is the join grammar.
    "warehouse_schema_registry_compat" -> ((s, d) => {
      val fields = s.range(8).select(col("id").as("version"))
        .crossJoin(s.range(15).select(col("id").as("field")))
        .where(col("field") < lit(10) + expr("version DIV 2") &&
          !(col("field") === col("version") - 3 && col("version") >= 5))
        .withColumn("required", col("field") % 3 =!= 0)
      val prev = fields.select((col("version") + 1).as("version"),
        col("field").as("p_field"), col("required").as("p_required"))
      val cur = fields.select(col("version"), col("field").as("c_field"),
        col("required").as("c_required"))
      cur.join(prev, cur("version") === prev("version") &&
          cur("c_field") === prev("p_field"), "full")
        .where(coalesce(cur("version"), prev("version")).between(1, 7))
        .select(coalesce(cur("version"), prev("version")).as("v"),
          col("c_field"), col("p_field"),
          col("c_required"), col("p_required"))
        .groupBy("v")
        .agg(sum(when(col("p_field").isNull, 1L).otherwise(0L)).as("added"),
          sum(when(col("c_field").isNull, 1L).otherwise(0L)).as("dropped"),
          sum(when(col("p_field").isNull && col("c_required"), 1L)
            .otherwise(0L)).as("added_required"),
          sum(when(col("c_field").isNull && col("p_required"), 1L)
            .otherwise(0L)).as("dropped_required"),
          count(lit(1)).as("fields_compared"))
        .withColumn("backward_compatible", col("added_required") === 0L)
        .withColumn("forward_compatible", col("dropped_required") === 0L)
        .withColumn("full_compatible",
          col("backward_compatible") && col("forward_compatible"))
        .orderBy("v")
    }),

    // Conformed-dimension drift audit — two marts carry "the same"
    // customer dimension; the replica drifted (planted: a stale segment
    // sync on custkey ≡ 5 mod 13, an off-by-a-cent balance on ≡ 2 mod
    // 17). The audit joins the replicas 1:1 on the key (co-partitioned
    // shuffle — the natural layout when both marts bucket by key) and
    // censuses per segment: keys compared, per-attribute mismatches,
    // any-drift count + ppm, and the highest drifted key (the incident
    // cursor a repair job resumes from). join_survivorship_merge PICKS a
    // winner; this op is the DETECTION side.
    "warehouse_dim_drift" -> ((s, d) => {
      val a = Tables.customer(s, d).select(col("c_custkey"),
        col("c_mktsegment"), expr("CAST(FLOOR(c_acctbal * 100) AS BIGINT)").as("cents"))
      val b = a.select(col("c_custkey"),
        when(col("c_custkey") % 13 === 5, lower(col("c_mktsegment")))
          .otherwise(col("c_mktsegment")).as("b_seg"),
        (col("cents") + when(col("c_custkey") % 17 === 2, 1L).otherwise(0L))
          .as("b_cents"))
      a.join(b, Seq("c_custkey"))
        .withColumn("seg_drift", (col("c_mktsegment") =!= col("b_seg")).cast("long"))
        .withColumn("bal_drift", (col("cents") =!= col("b_cents")).cast("long"))
        .withColumn("any_drift",
          greatest(col("seg_drift"), col("bal_drift")))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_keys"),
          sum("seg_drift").as("segment_mismatches"),
          sum("bal_drift").as("balance_mismatches"),
          sum("any_drift").as("drifted_keys"),
          max(when(col("any_drift") === 1L, col("c_custkey"))).as("max_drifted_key"))
        .withColumn("drift_ppm", expr("(drifted_keys * 1000000) DIV n_keys"))
        .orderBy("c_mktsegment")
    }),

    // Prefix-cache hit telemetry — the serving-cost lever vLLM-class
    // engines report: requests share system prompts (doc_id mod 7 picks
    // one of seven), so every prompt with an already-seen (source,
    // system-prompt) prefix re-uses the cached KV block. Hits = prompts
    // minus distinct prefixes per source; tokens saved = hits × the
    // 16-char ≈ 4-token prefix. One rollup over the request log — the
    // llm_kv_cache_plan sibling that grades REUSE, not residency.
    "llm_prefix_cache_hits" -> ((s, d) => {
      Tables.documents(s, d)
        .select(col("doc_id"), col("source"))
        .withColumn("sys_prompt", concat(lit("sys-"),
          (col("doc_id") % 7).cast("string")))
        .groupBy("source", "sys_prompt")
        .agg(count(lit(1)).as("prompts"))
        .groupBy("source")
        .agg(sum("prompts").as("n_prompts"),
          count(lit(1)).as("distinct_prefixes"),
          sum(col("prompts") - 1).as("cache_hits"),
          max("prompts").as("hottest_prefix"))
        .withColumn("hit_ppm", expr("(cache_hits * 1000000) DIV n_prompts"))
        .withColumn("tokens_saved", col("cache_hits") * 4L)
        .orderBy("source")
    }),

    // Priority load shedding — the overload policy between the rate
    // limiter (service_rate_limit_sliding) and the breaker
    // (service_circuit_breaker): each (user, day) cell holds a 2-request
    // budget and requests are admitted STRICTLY by priority class
    // (purchase > signup > error > click > view), ties broken on the
    // (ts_us, event_id) total order; everything past the budget sheds.
    // Cell population scales with per-principal traffic, so the rank
    // window never sees more than one principal-day. Graded per class:
    // requests, shed, shed ppm — the strict-priority invariant is that
    // senior classes shed at most as hard as junior ones.
    "service_load_shedding" -> ((s, d) => {
      val wCell = Window.partitionBy("user_id", "day")
        .orderBy("priority", "ts_us", "event_id")
      Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("ts_us"), col("event_type"))
        .withColumn("day", expr("ts_us DIV 86400000000"))
        .withColumn("priority",
          when(col("event_type") === "purchase", 0)
            .when(col("event_type") === "signup", 1)
            .when(col("event_type") === "error", 2)
            .when(col("event_type") === "click", 3).otherwise(4))
        .withColumn("shed",
          when(row_number().over(wCell) > 2, 1L).otherwise(0L))
        .groupBy("priority")
        .agg(count(lit(1)).as("n_requests"), sum("shed").as("n_shed"))
        .withColumn("kept", col("n_requests") - col("n_shed"))
        .withColumn("shed_ppm", expr("(n_shed * 1000000) DIV n_requests"))
        .orderBy("priority")
    }),

    // Annotator qualification by gold seeding — the labeling-ops gate
    // every human-data pipeline runs: every 5th item is a GOLD with a
    // known answer; good annotators (id % 3 ≠ 0) answer golds correctly
    // 9 times in 10, bad ones answer md5-noise (~25% right), and only
    // annotators at ≥ 70% gold accuracy keep their production labels.
    // Per annotator cohort: annotators, qualified, gold census, and the
    // production-label mass retained vs discarded — the cost of the
    // quality bar. Per-annotator rollup then cohort rollup, one scan.
    "llm_annotator_qualification" -> ((s, d) => {
      val tasks = Tables.events(s, d)
        .select(col("event_id"), (col("event_id") % 24).as("annotator"))
        .withColumn("is_gold", col("event_id") % 5 === 0)
        .withColumn("gold_answer", expr(
          "CAST(conv(substring(md5(concat('gold:', CAST(event_id AS STRING))), 1, 6), 16, 10) AS BIGINT) % 4"))
        .withColumn("answer",
          when(col("is_gold") && col("annotator") % 3 =!= 0 &&
            col("event_id") % 50 =!= 45, col("gold_answer"))
            .otherwise(expr(
              "CAST(conv(substring(md5(concat('ans:', CAST(event_id AS STRING))), 1, 6), 16, 10) AS BIGINT) % 4")))
      val perAnnotator = tasks.groupBy("annotator")
        .agg(sum(when(col("is_gold"), 1L).otherwise(0L)).as("golds"),
          sum(when(col("is_gold") && col("answer") === col("gold_answer"), 1L)
            .otherwise(0L)).as("gold_correct"),
          sum(when(!col("is_gold"), 1L).otherwise(0L)).as("prod_labels"))
        .withColumn("qualified",
          col("gold_correct") * 10L >= col("golds") * 7L)
      perAnnotator.groupBy((col("annotator") % 8).as("cohort"))
        .agg(count(lit(1)).as("n_annotators"),
          sum(when(col("qualified"), 1L).otherwise(0L)).as("n_qualified"),
          sum("golds").as("gold_tasks"),
          sum("gold_correct").as("gold_correct"),
          sum("prod_labels").as("labels_total"),
          sum(when(col("qualified"), col("prod_labels")).otherwise(0L))
            .as("labels_retained"))
        .withColumn("retention_ppm",
          expr("(labels_retained * 1000000) DIV labels_total"))
        .orderBy("cohort")
    }),

    // Conversion-lag cohorts — the signup→first-purchase funnel timing
    // (agg_funnel counts stage mass; this op grades the LAG): per user
    // the first signup, then the first purchase strictly after it, lag
    // in exact whole hours; cohorted by signup week: signed, converted,
    // conversion ppm, min/max lag and total lag mass (the inputs every
    // activation dashboard plots). Two conditional rollups + one join —
    // no window over the raw log.
    "agg_conversion_lag" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val signup = ev.where(col("event_type") === "signup")
        .groupBy("user_id").agg(min("ts_us").as("s_ts"))
      val conv = ev.where(col("event_type") === "purchase")
        .join(signup, Seq("user_id"))
        .where(col("ts_us") > col("s_ts"))
        .groupBy("user_id").agg(min("ts_us").as("p_ts"), min("s_ts").as("s_ts2"))
        .withColumn("lag_hours", expr("(p_ts - s_ts2) DIV 3600000000"))
      signup.join(conv.select("user_id", "lag_hours"), Seq("user_id"), "left")
        .groupBy(expr("s_ts DIV 604800000000").as("cohort_week"))
        .agg(count(lit(1)).as("signed_up"),
          sum(when(col("lag_hours").isNotNull, 1L).otherwise(0L)).as("converted"),
          min("lag_hours").as("min_lag_hours"),
          max("lag_hours").as("max_lag_hours"),
          sum(coalesce(col("lag_hours"), lit(0L))).as("lag_hours_mass"))
        .withColumn("conversion_ppm",
          expr("(converted * 1000000) DIV signed_up"))
        .orderBy("cohort_week")
    })
  )

  /** DuckDB twin of [[mrzCd]] — identical 7-3-1 fold in list form. */
  private def mrzCdSql(field: String): String =
    s"""CAST(list_sum(list_transform(range(1, 10), i ->
       |  (CASE WHEN substring($field, i, 1) = '<' THEN 0
       |        WHEN substring($field, i, 1) BETWEEN '0' AND '9'
       |          THEN ascii(substring($field, i, 1)) - 48
       |        ELSE ascii(substring($field, i, 1)) - 55 END)
       |  * ([7, 3, 1])[((i - 1) % 3) + 1])) AS BIGINT) % 10""".stripMargin

  val oracles: Map[String, String] = Map(
    "agg_bradley_terry" ->
      """WITH bt AS (
        |  SELECT user_id % 6 AS a, (user_id // 7) % 6 AS b, event_id
        |  FROM events WHERE user_id % 6 <> (user_id // 7) % 6),
        |w AS (
        |  SELECT a, b,
        |    CASE WHEN event_id % (a + b + 2) < a + 1 THEN a ELSE b END AS winner
        |  FROM bt),
        |pairs AS (
        |  SELECT least(a, b) AS i, greatest(a, b) AS j,
        |    CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(CASE WHEN winner = least(a, b) THEN 1 ELSE 0 END) AS BIGINT) AS wi
        |  FROM w GROUP BY 1, 2),
        |edges AS (
        |  SELECT i AS m, j AS o, n FROM pairs
        |  UNION ALL SELECT j, i, n FROM pairs),
        |base AS (
        |  SELECT m, CAST(SUM(w) AS BIGINT) AS wins, CAST(SUM(n) AS BIGINT) AS battles
        |  FROM (SELECT i AS m, wi AS w, n FROM pairs
        |        UNION ALL SELECT j, n - wi, n FROM pairs)
        |  GROUP BY 1),
        |d1 AS (
        |  SELECT m, CAST(SUM((CAST(n AS HUGEINT) * 1000000000000) // 2000000) AS BIGINT) AS denom
        |  FROM edges GROUP BY 1),
        |p1 AS (
        |  SELECT base.m, CAST((CAST(wins AS HUGEINT) * 1000000000000) // denom AS BIGINT) AS p
        |  FROM base JOIN d1 ON base.m = d1.m),
        |d2 AS (
        |  SELECT e.m, CAST(SUM((CAST(e.n AS HUGEINT) * 1000000000000) // (pm.p + po.p)) AS BIGINT) AS denom
        |  FROM edges e JOIN p1 pm ON e.m = pm.m JOIN p1 po ON e.o = po.m
        |  GROUP BY 1),
        |p2 AS (
        |  SELECT base.m, CAST((CAST(wins AS HUGEINT) * 1000000000000) // denom AS BIGINT) AS p
        |  FROM base JOIN d2 ON base.m = d2.m)
        |SELECT base.m AS model, battles, wins, p AS strength_ppm,
        |  CAST(ROW_NUMBER() OVER (ORDER BY p DESC, base.m) AS INT) AS rank
        |FROM base JOIN p2 ON base.m = p2.m
        |ORDER BY model""".stripMargin,

    "service_idempotency_replay" ->
      """WITH k AS (
        |  SELECT event_id -
        |    CASE WHEN event_id % 7 = 4 THEN 1
        |         WHEN event_id % 7 = 5 THEN 2 ELSE 0 END AS idem_key,
        |    CAST(COUNT(*) AS BIGINT) AS attempts,
        |    max(epoch_us(ts)) - min(epoch_us(ts)) AS span_us
        |  FROM events GROUP BY 1)
        |SELECT idem_key % 8 AS principal,
        |  CAST(SUM(attempts) AS BIGINT) AS n_attempts,
        |  CAST(COUNT(*) AS BIGINT) AS n_keys,
        |  CAST(SUM(CASE WHEN attempts >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_replayed,
        |  CAST(MAX(attempts) AS BIGINT) AS max_attempts,
        |  CAST(MAX(span_us) AS BIGINT) AS max_replay_window_us,
        |  CAST(SUM(attempts) - COUNT(*) AS BIGINT) AS wasted_attempts,
        |  (CAST(SUM(CASE WHEN attempts >= 2 THEN 1 ELSE 0 END) AS BIGINT) * 1000000)
        |    // CAST(COUNT(*) AS BIGINT) AS replay_ppm
        |FROM k GROUP BY 1 ORDER BY principal""".stripMargin,

    "fn_mrz_check" -> {
      val carried = mrzCdSql("doc_no")
      val recomputed = mrzCdSql("presented")
      s"""WITH docs AS (
         |  SELECT c_custkey, c_mktsegment,
         |    upper(substring(md5(CAST(c_custkey AS VARCHAR)), 1, 9)) AS doc_no
         |  FROM customer),
         |pres AS (
         |  SELECT c_mktsegment, doc_no, $carried AS carried_cd,
         |    CASE WHEN c_custkey % 11 = 7 THEN
         |      substring(doc_no, 1, 4) ||
         |      (CASE WHEN substring(doc_no, 5, 1) = '9' THEN '0'
         |            WHEN substring(doc_no, 5, 1) = 'F' THEN 'A'
         |            ELSE chr(ascii(substring(doc_no, 5, 1)) + 1) END) ||
         |      substring(doc_no, 6, 4)
         |    ELSE doc_no END AS presented
         |  FROM docs),
         |v AS (
         |  SELECT c_mktsegment, carried_cd,
         |    ($recomputed = carried_cd) AS valid
         |  FROM pres)
         |SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(CASE WHEN NOT valid THEN 1 ELSE 0 END) AS BIGINT) AS n_failed,
         |  CAST(SUM(carried_cd) AS BIGINT) AS carried_cd_sum,
         |  (CAST(SUM(CASE WHEN NOT valid THEN 1 ELSE 0 END) AS BIGINT) * 1000000)
         |    // CAST(COUNT(*) AS BIGINT) AS fail_ppm
         |FROM v GROUP BY 1 ORDER BY c_mktsegment""".stripMargin
    },

    "agg_psi_stability" ->
      """WITH sc AS (
        |  SELECT event_type, user_id % 2 AS period,
        |    value + CASE WHEN user_id % 2 = 1
        |      AND event_type IN ('error', 'purchase') THEN 80.0 ELSE 0.0 END AS score
        |  FROM events),
        |b AS (
        |  SELECT event_type,
        |    LEAST(CAST(FLOOR(score / 40) AS INT), 9) AS bin,
        |    CAST(SUM(CASE WHEN period = 0 THEN 1 ELSE 0 END) AS BIGINT) AS b,
        |    CAST(SUM(CASE WHEN period = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c
        |  FROM sc GROUP BY 1, 2),
        |t AS (
        |  SELECT event_type, bin, b, c,
        |    SUM(b) OVER (PARTITION BY event_type) AS bt,
        |    SUM(c) OVER (PARTITION BY event_type) AS ct
        |  FROM b),
        |terms AS (
        |  SELECT event_type, bt, ct,
        |    CASE WHEN b > 0 AND c > 0 THEN 1 ELSE 0 END AS used,
        |    CASE WHEN b > 0 AND c > 0 THEN
        |      CAST(round((CAST(c AS DOUBLE) / ct - CAST(b AS DOUBLE) / bt)
        |        * ln((CAST(c AS DOUBLE) * bt) / (CAST(b AS DOUBLE) * ct)) * 1000000) AS BIGINT)
        |    ELSE 0 END AS term_micro
        |  FROM t)
        |SELECT event_type, CAST(MAX(bt) AS BIGINT) AS base_n,
        |  CAST(MAX(ct) AS BIGINT) AS cur_n,
        |  CAST(SUM(used) AS BIGINT) AS bins_used,
        |  CAST(SUM(term_micro) AS BIGINT) AS psi_micro,
        |  CAST(SUM(term_micro) AS BIGINT) >= 200000 AS drift
        |FROM terms GROUP BY 1 ORDER BY event_type""".stripMargin,

    "service_circuit_breaker" ->
      """WITH ev AS (
        |  SELECT user_id % 4 AS service, event_id, epoch_us(ts) AS ts_us,
        |    CASE WHEN event_type = 'error'
        |      OR (event_id // 50) % 13 = 7 THEN 1 ELSE 0 END AS fail
        |  FROM events),
        |w AS (
        |  SELECT service, event_id, ts_us, fail,
        |    SUM(fail) OVER (PARTITION BY service ORDER BY ts_us, event_id
        |      ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS werr
        |  FROM ev),
        |o AS (
        |  SELECT service, event_id, ts_us, werr,
        |    CASE WHEN werr >= 8 THEN 1 ELSE 0 END AS open,
        |    ROW_NUMBER() OVER (PARTITION BY service ORDER BY ts_us, event_id)
        |      - ROW_NUMBER() OVER (PARTITION BY service,
        |          CASE WHEN werr >= 8 THEN 1 ELSE 0 END
        |          ORDER BY ts_us, event_id) AS island
        |  FROM w),
        |runs AS (
        |  SELECT service, island, CAST(COUNT(*) AS BIGINT) AS run_len
        |  FROM o WHERE open = 1 GROUP BY 1, 2),
        |r AS (
        |  SELECT service, CAST(COUNT(*) AS BIGINT) AS n_trips,
        |    CAST(MAX(run_len) AS BIGINT) AS longest_open_run
        |  FROM runs GROUP BY 1)
        |SELECT o.service, CAST(COUNT(*) AS BIGINT) AS n_requests,
        |  CAST(SUM(open) AS BIGINT) AS open_requests,
        |  CAST(MAX(werr) AS BIGINT) AS max_window_fails,
        |  COALESCE(MAX(r.n_trips), 0) AS n_trips,
        |  COALESCE(MAX(r.longest_open_run), 0) AS longest_open_run
        |FROM o LEFT JOIN r ON o.service = r.service
        |GROUP BY 1 ORDER BY o.service""".stripMargin,

    "llm_rag_budget_pack" ->
      """WITH cand AS (
        |  SELECT t.q, d.doc_id, d.n_chars // 4 AS tok,
        |    ('0x' || substring(md5(CAST(t.q AS VARCHAR) || ':' ||
        |      CAST(d.doc_id AS VARCHAR)), 1, 6))::BIGINT % 1000 AS score
        |  FROM documents d CROSS JOIN (SELECT range AS q FROM range(0, 64)) t),
        |packed AS (
        |  SELECT q, tok,
        |    SUM(tok) OVER (PARTITION BY q ORDER BY score DESC, doc_id
        |      ROWS UNBOUNDED PRECEDING) AS cumtok
        |  FROM cand WHERE score >= 900)
        |SELECT q % 8 AS q_bucket,
        |  CAST(COUNT(DISTINCT q) AS BIGINT) AS n_queries,
        |  CAST(SUM(CASE WHEN cumtok <= 256 THEN 1 ELSE 0 END) AS BIGINT) AS n_packed,
        |  CAST(SUM(CASE WHEN cumtok <= 256 THEN tok ELSE 0 END) AS BIGINT) AS packed_tokens,
        |  CAST(SUM(CASE WHEN cumtok > 256 AND cumtok - tok <= 256 THEN 1 ELSE 0 END) AS BIGINT) AS boundary_dropped,
        |  (CAST(SUM(CASE WHEN cumtok <= 256 THEN tok ELSE 0 END) AS BIGINT) * 1000000)
        |    // (CAST(COUNT(DISTINCT q) AS BIGINT) * 256) AS util_ppm
        |FROM packed GROUP BY 1 ORDER BY q_bucket""".stripMargin,

    "service_retry_storm" ->
      """WITH g AS (
        |  SELECT event_id // 4 AS chain, event_id, epoch_us(ts) AS ts_us,
        |    epoch_us(ts) - LAG(epoch_us(ts)) OVER w AS gap
        |  FROM events
        |  WINDOW w AS (PARTITION BY event_id // 4 ORDER BY epoch_us(ts), event_id)),
        |s2 AS (
        |  SELECT chain, gap,
        |    CASE WHEN gap < LAG(gap) OVER
        |      (PARTITION BY chain ORDER BY ts_us, event_id)
        |      THEN 1 ELSE 0 END AS shrunk
        |  FROM g),
        |c AS (
        |  SELECT chain, CAST(COUNT(*) AS BIGINT) AS attempts,
        |    CAST(MAX(shrunk) AS BIGINT) AS viol,
        |    MIN(gap) AS min_gap
        |  FROM s2 GROUP BY 1)
        |SELECT chain % 4 AS service, CAST(COUNT(*) AS BIGINT) AS n_chains,
        |  CAST(SUM(attempts) AS BIGINT) AS n_attempts,
        |  CAST(SUM(viol) AS BIGINT) AS violating_chains,
        |  CAST(MIN(min_gap) AS BIGINT) AS min_gap_us,
        |  (CAST(SUM(attempts) AS BIGINT) * 1000000) // CAST(COUNT(*) AS BIGINT) AS amplification_ppm,
        |  (CAST(SUM(viol) AS BIGINT) * 1000000) // CAST(COUNT(*) AS BIGINT) AS violation_ppm
        |FROM c GROUP BY 1 ORDER BY service""".stripMargin,

    "llm_wer_eval" ->
      """WITH e AS (
        |  SELECT doc_id, source,
        |    array_to_string(list_transform(str_split(text, ' ')[1:12],
        |      w -> chr(CAST(65 + ('0x' || substring(md5(w), 1, 4))::BIGINT % 26 AS INT))),
        |      '') AS enc,
        |    LEAST(len(str_split(text, ' ')), 12) AS n_words,
        |    CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'drop3'
        |      WHEN 1 THEN 'swap' ELSE 'clean' END AS class
        |  FROM documents),
        |h AS (
        |  SELECT source, class, n_words, enc,
        |    CASE WHEN class = 'drop3' THEN regexp_replace(enc, '(..).', '\1', 'g')
        |         WHEN class = 'swap' AND length(enc) >= 2 THEN
        |           substring(enc, 2, 1) || substring(enc, 1, 1) || substring(enc, 3)
        |         ELSE enc END AS hyp
        |  FROM e)
        |SELECT source, class, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM((levenshtein(enc, hyp) * CAST(1000000 AS BIGINT)) // n_words) AS BIGINT) AS wer_ppm_mass,
        |  CAST(MAX((levenshtein(enc, hyp) * CAST(1000000 AS BIGINT)) // n_words) AS BIGINT) AS worst_wer_ppm
        |FROM h GROUP BY 1, 2 ORDER BY source, class""".stripMargin,

    "warehouse_pseudonym_consistent" ->
      """WITH cust AS (
        |  SELECT c_custkey, c_mktsegment,
        |    upper(substring(md5('pepper2024:' || CAST(c_custkey AS VARCHAR)), 1, 12)) AS pseudo
        |  FROM customer),
        |pc AS (
        |  SELECT c_mktsegment, pseudo, CAST(COUNT(*) AS BIGINT) AS keys
        |  FROM cust GROUP BY 1, 2),
        |dim AS (
        |  SELECT c_mktsegment, CAST(SUM(keys) AS BIGINT) AS n_customers,
        |    CAST(COUNT(*) AS BIGINT) AS n_pseudonyms,
        |    CAST(MAX(keys) AS BIGINT) AS max_keys_per_pseudo
        |  FROM pc GROUP BY 1),
        |fact AS (
        |  SELECT cust.c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_orders,
        |    CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS order_cents
        |  FROM orders
        |  JOIN cust ON upper(substring(md5('pepper2024:' ||
        |    CAST(o_custkey AS VARCHAR)), 1, 12)) = cust.pseudo
        |  GROUP BY 1)
        |SELECT dim.c_mktsegment, n_customers, n_pseudonyms, max_keys_per_pseudo,
        |  n_orders, order_cents
        |FROM dim JOIN fact ON dim.c_mktsegment = fact.c_mktsegment
        |ORDER BY dim.c_mktsegment""".stripMargin,

    "service_impossible_travel" ->
      """WITH loc AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
        |    CASE WHEN event_id % 17 = 3 THEN event_id % 20
        |         ELSE user_id % 20 END AS city
        |  FROM events),
        |xy AS (
        |  SELECT user_id, event_id, ts_us,
        |    (city % 5) * 1000 AS x, (city // 5) * 1000 AS y
        |  FROM loc),
        |tr AS (
        |  SELECT user_id,
        |    GREATEST(abs(x - LAG(x) OVER w), abs(y - LAG(y) OVER w)) AS dist,
        |    GREATEST(ts_us - LAG(ts_us) OVER w, 1) AS dt_us
        |  FROM xy WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
        |sp AS (
        |  SELECT user_id, dist, (dist * 3600000000) // dt_us AS speed
        |  FROM tr WHERE dist IS NOT NULL)
        |SELECT user_id % 8 AS principal,
        |  CAST(COUNT(*) AS BIGINT) AS n_transitions,
        |  CAST(SUM(CASE WHEN dist > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_moves,
        |  CAST(SUM(CASE WHEN speed > 900 THEN 1 ELSE 0 END) AS BIGINT) AS n_impossible,
        |  CAST(MAX(speed) AS BIGINT) AS max_speed,
        |  (CAST(SUM(CASE WHEN speed > 900 THEN 1 ELSE 0 END) AS BIGINT) * 1000000)
        |    // CAST(COUNT(*) AS BIGINT) AS impossible_ppm
        |FROM sp GROUP BY 1 ORDER BY principal""".stripMargin,

    "mm_subtitle_align" ->
      """WITH ev AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
        |    CAST(FLOOR(value * 10000) AS BIGINT) AS dur_us,
        |    epoch_us(ts) // 3600000000 AS hour
        |  FROM events),
        |segs AS (
        |  SELECT user_id, hour, ts_us AS s_start, ts_us + dur_us AS s_end
        |  FROM ev WHERE event_id % 2 = 0),
        |cues AS (
        |  SELECT user_id, hour, event_id AS cue_id, ts_us AS c_start,
        |    ts_us + dur_us AS c_end
        |  FROM ev WHERE event_id % 2 = 1),
        |pairs AS (
        |  SELECT c.user_id, c.cue_id, c.c_end - c.c_start AS c_dur,
        |    GREATEST(LEAST(c.c_end, s.s_end) - GREATEST(c.c_start, s.s_start), 0)
        |      AS overlap
        |  FROM cues c LEFT JOIN segs s
        |    ON c.user_id = s.user_id AND c.hour = s.hour),
        |per_cue AS (
        |  SELECT user_id, cue_id, c_dur,
        |    CAST(SUM(CASE WHEN overlap > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_overlapping,
        |    CAST(MAX(COALESCE(overlap, 0)) AS BIGINT) AS best_overlap,
        |    CAST(SUM(COALESCE(overlap, 0)) AS BIGINT) AS overlap_mass
        |  FROM pairs GROUP BY 1, 2, 3)
        |SELECT user_id % 8 AS principal, CAST(COUNT(*) AS BIGINT) AS n_cues,
        |  CAST(SUM(CASE WHEN n_overlapping > 0 THEN 1 ELSE 0 END) AS BIGINT) AS matched_cues,
        |  CAST(SUM(CASE WHEN best_overlap * 2 >= c_dur THEN 1 ELSE 0 END) AS BIGINT) AS aligned_cues,
        |  CAST(SUM(CASE WHEN n_overlapping = 0 THEN 1 ELSE 0 END) AS BIGINT) AS orphan_cues,
        |  CAST(SUM(overlap_mass) AS BIGINT) AS overlap_mass_us
        |FROM per_cue GROUP BY 1 ORDER BY principal""".stripMargin,

    "llm_crawl_frontier_plan" ->
      """WITH u AS (
        |  SELECT doc_id, source,
        |    source || '-' || CAST(doc_id % 50 AS VARCHAR) AS host,
        |    ('0x' || substring(md5('url:' || CAST(doc_id AS VARCHAR)), 1, 6))::BIGINT
        |      % 1000 AS prio
        |  FROM documents),
        |r AS (
        |  SELECT source, host,
        |    (CAST(ROW_NUMBER() OVER (PARTITION BY host ORDER BY prio DESC, doc_id)
        |      AS BIGINT) - 1) // 2 AS round
        |  FROM u)
        |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_urls,
        |  CAST(COUNT(DISTINCT host) AS BIGINT) AS n_hosts,
        |  CAST(MAX(round) + 1 AS BIGINT) AS rounds_to_drain,
        |  CAST(SUM(CASE WHEN round = 0 THEN 1 ELSE 0 END) AS BIGINT) AS round0_urls,
        |  (CAST(SUM(CASE WHEN round = 0 THEN 1 ELSE 0 END) AS BIGINT) * 1000000)
        |    // CAST(COUNT(*) AS BIGINT) AS round0_share_ppm
        |FROM r GROUP BY 1 ORDER BY source""".stripMargin,

    "llm_moe_router_balance" ->
      """WITH g AS (
        |  SELECT event_id, event_id % 4 AS layer,
        |    ('0x' || substring(md5('e1:' || CAST(event_id AS VARCHAR)), 1, 6))::BIGINT % 16 AS e1,
        |    ('0x' || substring(md5('e2:' || CAST(event_id AS VARCHAR)), 1, 6))::BIGINT % 15 AS e2r
        |  FROM events),
        |r AS (
        |  SELECT layer, e1 AS expert FROM g
        |  UNION ALL
        |  SELECT layer, CASE WHEN e2r >= e1 THEN e2r + 1 ELSE e2r END FROM g),
        |loads AS (
        |  SELECT layer, expert, CAST(COUNT(*) AS BIGINT) AS load
        |  FROM r GROUP BY 1, 2),
        |agg AS (
        |  SELECT layer, CAST(SUM(load) AS BIGINT) AS n_assignments,
        |    CAST(COUNT(*) AS BIGINT) AS experts_used,
        |    CAST(MAX(load) AS BIGINT) AS max_load,
        |    CAST(SUM(load * load) AS BIGINT) AS l2
        |  FROM loads GROUP BY 1)
        |SELECT layer, n_assignments // 2 AS n_tokens, n_assignments,
        |  experts_used,
        |  (max_load * 1000000) // n_assignments AS max_load_ppm,
        |  CAST((CAST(16 AS HUGEINT) * l2 * 1000000)
        |    // (CAST(n_assignments AS HUGEINT) * n_assignments) AS BIGINT) AS balance_factor_ppm
        |FROM agg ORDER BY layer""".stripMargin,

    "mm_frame_dedup_temporal" ->
      """WITH sh AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
        |    (CAST(ROW_NUMBER() OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(ts), event_id) AS BIGINT) - 1) // 5 AS shot
        |  FROM events),
        |f AS (
        |  SELECT user_id, event_id, ts_us,
        |    xor(('0x' || substring(md5('ph:' || CAST(user_id AS VARCHAR) || ':' ||
        |      CAST(shot AS VARCHAR)), 1, 15))::BIGINT,
        |      event_id % 3) AS phash
        |  FROM sh),
        |l AS (
        |  SELECT user_id, phash,
        |    LAG(phash) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS prev
        |  FROM f),
        |d AS (
        |  SELECT user_id,
        |    CASE WHEN prev IS NOT NULL
        |      AND bit_count(CAST(xor(phash, prev) AS BIGINT)) <= 4
        |      THEN 1 ELSE 0 END AS dropped
        |  FROM l)
        |SELECT user_id % 8 AS principal, CAST(COUNT(*) AS BIGINT) AS n_frames,
        |  CAST(SUM(dropped) AS BIGINT) AS n_dropped,
        |  CAST(COUNT(*) - SUM(dropped) AS BIGINT) AS n_kept,
        |  (CAST(SUM(dropped) AS BIGINT) * 1000000) // CAST(COUNT(*) AS BIGINT) AS drop_ppm
        |FROM d GROUP BY 1 ORDER BY principal""".stripMargin,

    "fn_semver_latest" ->
      """WITH v AS (
        |  SELECT o_orderkey % 12 AS component,
        |    'v' || CAST(o_orderkey % 3 AS VARCHAR) || '.' ||
        |      CAST((o_orderkey // 3) % 10 AS VARCHAR) || '.' ||
        |      CAST((o_orderkey // 30) % 20 AS VARCHAR) AS version
        |  FROM orders),
        |p AS (
        |  SELECT component, version,
        |    CAST(regexp_extract(version, '^v(\d+)\.(\d+)\.(\d+)$', 1) AS BIGINT) * 1000000
        |    + CAST(regexp_extract(version, '^v(\d+)\.(\d+)\.(\d+)$', 2) AS BIGINT) * 1000
        |    + CAST(regexp_extract(version, '^v(\d+)\.(\d+)\.(\d+)$', 3) AS BIGINT) AS numkey
        |  FROM v)
        |SELECT component, CAST(COUNT(*) AS BIGINT) AS n_versions,
        |  CAST(COUNT(DISTINCT version) AS BIGINT) AS n_distinct_versions,
        |  max_by(version, numkey) AS latest_semver,
        |  MAX(version) AS lex_max,
        |  max_by(version, numkey) <> MAX(version) AS lex_wrong
        |FROM p GROUP BY 1 ORDER BY component""".stripMargin,

    "warehouse_retention_legal_hold" ->
      """WITH hwm AS (SELECT MAX(o_orderdate) AS h FROM orders),
        |j AS (
        |  SELECT c_mktsegment, o_custkey, o_totalprice,
        |    date_diff('day', o_orderdate, (SELECT h FROM hwm)) >
        |      CASE WHEN c_mktsegment IN ('BUILDING', 'MACHINERY')
        |        THEN 365 ELSE 540 END AS expired,
        |    o_custkey % 23 = 5 AS held
        |  FROM orders JOIN customer ON o_custkey = c_custkey)
        |SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_orders,
        |  CAST(SUM(CASE WHEN expired THEN 1 ELSE 0 END) AS BIGINT) AS n_expired,
        |  CAST(SUM(CASE WHEN held THEN 1 ELSE 0 END) AS BIGINT) AS n_held,
        |  CAST(SUM(CASE WHEN expired AND held THEN 1 ELSE 0 END) AS BIGINT) AS n_conflicts,
        |  CAST(SUM(CASE WHEN expired AND NOT held THEN 1 ELSE 0 END) AS BIGINT) AS n_deletable,
        |  CAST(SUM(CASE WHEN expired AND NOT held
        |    THEN CAST(FLOOR(o_totalprice * 100) AS BIGINT) ELSE 0 END) AS BIGINT)
        |    AS deletable_cents
        |FROM j GROUP BY 1 ORDER BY c_mktsegment""".stripMargin,

    "service_api_version_adoption" ->
      """WITH calls AS (
        |  SELECT epoch_us(ts) // 604800000000 AS week,
        |    CASE WHEN ('0x' || substring(md5('ver:' || CAST(event_id AS VARCHAR)), 1, 6))::BIGINT % 1000 < 5 THEN 'v0'
        |         WHEN ('0x' || substring(md5('ver:' || CAST(event_id AS VARCHAR)), 1, 6))::BIGINT % 1000 < 85 THEN 'v1'
        |         ELSE 'v2' END AS version
        |  FROM events),
        |pw AS (
        |  SELECT week, version, CAST(COUNT(*) AS BIGINT) AS calls
        |  FROM calls GROUP BY 1, 2),
        |wt AS (SELECT week, CAST(SUM(calls) AS BIGINT) AS week_calls
        |       FROM pw GROUP BY 1),
        |fw AS (SELECT MAX(week) AS final_week FROM wt),
        |tt AS (
        |  SELECT CAST(SUM(week_calls) AS BIGINT) AS trail_total FROM wt
        |  WHERE week > (SELECT final_week FROM fw) - 4),
        |sh AS (
        |  SELECT pw.version, pw.week, pw.calls,
        |    (pw.calls * 1000000) // wt.week_calls AS share_ppm
        |  FROM pw JOIN wt ON pw.week = wt.week),
        |v AS (
        |  SELECT version, CAST(SUM(calls) AS BIGINT) AS total_calls,
        |    CAST(COUNT(*) AS BIGINT) AS active_weeks,
        |    CAST(MAX(week) AS BIGINT) AS last_active_week,
        |    max_by(share_ppm, week) AS final_week_share_ppm,
        |    CAST(SUM(CASE WHEN week > (SELECT final_week FROM fw) - 4
        |      THEN calls ELSE 0 END) AS BIGINT) AS trailing4w_calls
        |  FROM sh GROUP BY 1)
        |SELECT version, total_calls, active_weeks, last_active_week,
        |  final_week_share_ppm, trailing4w_calls,
        |  (trailing4w_calls * 1000000) // (SELECT trail_total FROM tt)
        |    AS trailing4w_share_ppm,
        |  (trailing4w_calls * 1000000) // (SELECT trail_total FROM tt) < 10000
        |    AS deprecation_ready
        |FROM v ORDER BY version""".stripMargin,

    "llm_distill_agreement" ->
      """WITH p AS (
        |  SELECT vec_id, label % 8 AS teacher,
        |    CASE WHEN vec_id % 9 = 2 THEN (label % 8 + 1) % 8
        |         ELSE label % 8 END AS student
        |  FROM embeddings),
        |conf AS (
        |  SELECT teacher, student, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM p GROUP BY 1, 2)
        |SELECT teacher, CAST(SUM(n) AS BIGINT) AS support,
        |  CAST(SUM(CASE WHEN student = teacher THEN n ELSE 0 END) AS BIGINT) AS agreements,
        |  max_by(student, CASE WHEN student = teacher THEN -1 ELSE n END) AS top_confusion,
        |  (CAST(SUM(CASE WHEN student = teacher THEN n ELSE 0 END) AS BIGINT) * 1000000)
        |    // CAST(SUM(n) AS BIGINT) AS agreement_ppm
        |FROM conf GROUP BY 1 ORDER BY teacher""".stripMargin,

    "warehouse_schema_registry_compat" ->
      """WITH f AS (
        |  SELECT v.range AS version, fl.range AS field,
        |    (fl.range % 3) <> 0 AS required
        |  FROM range(0, 8) v CROSS JOIN range(0, 15) fl
        |  WHERE fl.range < 10 + v.range // 2
        |    AND NOT (fl.range = v.range - 3 AND v.range >= 5)),
        |cur AS (SELECT version, field AS c_field, required AS c_required FROM f),
        |prev AS (SELECT version + 1 AS version, field AS p_field,
        |         required AS p_required FROM f),
        |j AS (
        |  SELECT COALESCE(cur.version, prev.version) AS v,
        |    c_field, p_field, c_required, p_required
        |  FROM cur FULL OUTER JOIN prev
        |    ON cur.version = prev.version AND cur.c_field = prev.p_field
        |  WHERE COALESCE(cur.version, prev.version) BETWEEN 1 AND 7),
        |a AS (
        |  SELECT v,
        |    CAST(SUM(CASE WHEN p_field IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS added,
        |    CAST(SUM(CASE WHEN c_field IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS dropped,
        |    CAST(SUM(CASE WHEN p_field IS NULL AND c_required THEN 1 ELSE 0 END) AS BIGINT) AS added_required,
        |    CAST(SUM(CASE WHEN c_field IS NULL AND p_required THEN 1 ELSE 0 END) AS BIGINT) AS dropped_required,
        |    CAST(COUNT(*) AS BIGINT) AS fields_compared
        |  FROM j GROUP BY 1)
        |SELECT v, added, dropped, added_required, dropped_required,
        |  fields_compared,
        |  added_required = 0 AS backward_compatible,
        |  dropped_required = 0 AS forward_compatible,
        |  added_required = 0 AND dropped_required = 0 AS full_compatible
        |FROM a ORDER BY v""".stripMargin,

    "warehouse_dim_drift" ->
      """WITH a AS (
        |  SELECT c_custkey, c_mktsegment,
        |    CAST(FLOOR(c_acctbal * 100) AS BIGINT) AS cents
        |  FROM customer),
        |b AS (
        |  SELECT c_custkey,
        |    CASE WHEN c_custkey % 13 = 5 THEN lower(c_mktsegment)
        |         ELSE c_mktsegment END AS b_seg,
        |    cents + CASE WHEN c_custkey % 17 = 2 THEN 1 ELSE 0 END AS b_cents
        |  FROM a),
        |j AS (
        |  SELECT a.c_mktsegment, a.c_custkey,
        |    CASE WHEN a.c_mktsegment <> b.b_seg THEN 1 ELSE 0 END AS seg_drift,
        |    CASE WHEN a.cents <> b.b_cents THEN 1 ELSE 0 END AS bal_drift
        |  FROM a JOIN b ON a.c_custkey = b.c_custkey)
        |SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_keys,
        |  CAST(SUM(seg_drift) AS BIGINT) AS segment_mismatches,
        |  CAST(SUM(bal_drift) AS BIGINT) AS balance_mismatches,
        |  CAST(SUM(GREATEST(seg_drift, bal_drift)) AS BIGINT) AS drifted_keys,
        |  CAST(MAX(CASE WHEN GREATEST(seg_drift, bal_drift) = 1
        |    THEN c_custkey END) AS BIGINT) AS max_drifted_key,
        |  (CAST(SUM(GREATEST(seg_drift, bal_drift)) AS BIGINT) * 1000000)
        |    // CAST(COUNT(*) AS BIGINT) AS drift_ppm
        |FROM j GROUP BY 1 ORDER BY c_mktsegment""".stripMargin,

    "llm_prefix_cache_hits" ->
      """WITH g AS (
        |  SELECT source, 'sys-' || CAST(doc_id % 7 AS VARCHAR) AS sys_prompt,
        |    CAST(COUNT(*) AS BIGINT) AS prompts
        |  FROM documents GROUP BY 1, 2)
        |SELECT source, CAST(SUM(prompts) AS BIGINT) AS n_prompts,
        |  CAST(COUNT(*) AS BIGINT) AS distinct_prefixes,
        |  CAST(SUM(prompts - 1) AS BIGINT) AS cache_hits,
        |  CAST(MAX(prompts) AS BIGINT) AS hottest_prefix,
        |  (CAST(SUM(prompts - 1) AS BIGINT) * 1000000)
        |    // CAST(SUM(prompts) AS BIGINT) AS hit_ppm,
        |  CAST(SUM(prompts - 1) * 4 AS BIGINT) AS tokens_saved
        |FROM g GROUP BY 1 ORDER BY source""".stripMargin,

    "service_load_shedding" ->
      """WITH p AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
        |    epoch_us(ts) // 86400000000 AS day,
        |    CASE event_type WHEN 'purchase' THEN 0 WHEN 'signup' THEN 1
        |      WHEN 'error' THEN 2 WHEN 'click' THEN 3 ELSE 4 END AS priority
        |  FROM events),
        |r AS (
        |  SELECT priority,
        |    CASE WHEN ROW_NUMBER() OVER (PARTITION BY user_id, day
        |      ORDER BY priority, ts_us, event_id) > 2 THEN 1 ELSE 0 END AS shed
        |  FROM p)
        |SELECT priority, CAST(COUNT(*) AS BIGINT) AS n_requests,
        |  CAST(SUM(shed) AS BIGINT) AS n_shed,
        |  CAST(COUNT(*) - SUM(shed) AS BIGINT) AS kept,
        |  (CAST(SUM(shed) AS BIGINT) * 1000000) // CAST(COUNT(*) AS BIGINT) AS shed_ppm
        |FROM r GROUP BY 1 ORDER BY priority""".stripMargin,

    "llm_annotator_qualification" ->
      """WITH t AS (
        |  SELECT event_id, event_id % 24 AS annotator,
        |    event_id % 5 = 0 AS is_gold,
        |    ('0x' || substring(md5('gold:' || CAST(event_id AS VARCHAR)), 1, 6))::BIGINT % 4 AS gold_answer,
        |    ('0x' || substring(md5('ans:' || CAST(event_id AS VARCHAR)), 1, 6))::BIGINT % 4 AS noise
        |  FROM events),
        |a AS (
        |  SELECT annotator, is_gold, gold_answer,
        |    CASE WHEN is_gold AND annotator % 3 <> 0 AND event_id % 50 <> 45
        |      THEN gold_answer ELSE noise END AS answer
        |  FROM t),
        |pa AS (
        |  SELECT annotator,
        |    CAST(SUM(CASE WHEN is_gold THEN 1 ELSE 0 END) AS BIGINT) AS golds,
        |    CAST(SUM(CASE WHEN is_gold AND answer = gold_answer THEN 1 ELSE 0 END) AS BIGINT) AS gold_correct,
        |    CAST(SUM(CASE WHEN NOT is_gold THEN 1 ELSE 0 END) AS BIGINT) AS prod_labels
        |  FROM a GROUP BY 1),
        |q AS (SELECT *, gold_correct * 10 >= golds * 7 AS qualified FROM pa)
        |SELECT annotator % 8 AS cohort, CAST(COUNT(*) AS BIGINT) AS n_annotators,
        |  CAST(SUM(CASE WHEN qualified THEN 1 ELSE 0 END) AS BIGINT) AS n_qualified,
        |  CAST(SUM(golds) AS BIGINT) AS gold_tasks,
        |  CAST(SUM(gold_correct) AS BIGINT) AS gold_correct,
        |  CAST(SUM(prod_labels) AS BIGINT) AS labels_total,
        |  CAST(SUM(CASE WHEN qualified THEN prod_labels ELSE 0 END) AS BIGINT) AS labels_retained,
        |  (CAST(SUM(CASE WHEN qualified THEN prod_labels ELSE 0 END) AS BIGINT) * 1000000)
        |    // CAST(SUM(prod_labels) AS BIGINT) AS retention_ppm
        |FROM q GROUP BY 1 ORDER BY cohort""".stripMargin,

    "agg_conversion_lag" ->
      """WITH s AS (
        |  SELECT user_id, MIN(epoch_us(ts)) AS s_ts
        |  FROM events WHERE event_type = 'signup' GROUP BY 1),
        |c AS (
        |  SELECT e.user_id,
        |    (MIN(epoch_us(e.ts)) - MIN(s.s_ts)) // 3600000000 AS lag_hours
        |  FROM events e JOIN s ON e.user_id = s.user_id
        |  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > s.s_ts
        |  GROUP BY 1)
        |SELECT s.s_ts // 604800000000 AS cohort_week,
        |  CAST(COUNT(*) AS BIGINT) AS signed_up,
        |  CAST(SUM(CASE WHEN lag_hours IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS converted,
        |  CAST(MIN(lag_hours) AS BIGINT) AS min_lag_hours,
        |  CAST(MAX(lag_hours) AS BIGINT) AS max_lag_hours,
        |  CAST(SUM(COALESCE(lag_hours, 0)) AS BIGINT) AS lag_hours_mass,
        |  (CAST(SUM(CASE WHEN lag_hours IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) * 1000000)
        |    // CAST(COUNT(*) AS BIGINT) AS conversion_ppm
        |FROM s LEFT JOIN c ON s.user_id = c.user_id
        |GROUP BY 1 ORDER BY cohort_week""".stripMargin
  )
}
