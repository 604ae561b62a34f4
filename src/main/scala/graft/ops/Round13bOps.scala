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
            expr("(n * 1000000000000) DIV (pm + po)").as("term"))
          .groupBy("m").agg(sum("term").as("denom"))
        base.join(d2, Seq("m"))
          .select(col("m"), expr("(wins * 1000000000000) DIV denom").as("p"))
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
        |  SELECT m, CAST(SUM((n * 1000000000000) // 2000000) AS BIGINT) AS denom
        |  FROM edges GROUP BY 1),
        |p1 AS (
        |  SELECT base.m, (wins * 1000000000000) // denom AS p
        |  FROM base JOIN d1 ON base.m = d1.m),
        |d2 AS (
        |  SELECT e.m, CAST(SUM((e.n * 1000000000000) // (pm.p + po.p)) AS BIGINT) AS denom
        |  FROM edges e JOIN p1 pm ON e.m = pm.m JOIN p1 po ON e.o = po.m
        |  GROUP BY 1),
        |p2 AS (
        |  SELECT base.m, (wins * 1000000000000) // denom AS p
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
    }
  )
}
