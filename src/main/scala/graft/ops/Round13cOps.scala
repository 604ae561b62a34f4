package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Round-13 operators, third compilation unit (waves 24+) — same paired
  * impl/oracle style and engine-exactness laws as Round13Ops/Round13bOps.
  */
object Round13cOps {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // Concurrent-session detection — the account-sharing signal a person
    // service audits (one principal, overlapping live sessions): each
    // login opens a session of value-seconds; the classic sweep-line
    // (+1 at start, −1 at end, running sum in the (t, delta DESC,
    // event_id) total order so a start that touches an end counts as
    // concurrent) yields the live-session count at every boundary. Per
    // principal: sessions, peak concurrency, and the boundary census at
    // ≥ 2 live (the sharing evidence). The sweep is one user-partitioned
    // window over 2 rows per session — linear at any scale.
    "service_concurrent_sessions" -> ((s, d) => {
      val sess = Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("ts_us"),
          expr("CAST(FLOOR(value * 1000000) AS BIGINT)").as("dur_us"))
      val marks = sess.select(col("user_id"), col("event_id"),
          col("ts_us").as("t"), lit(1L).as("delta"))
        .unionByName(sess.select(col("user_id"), col("event_id"),
          (col("ts_us") + col("dur_us")).as("t"), lit(-1L).as("delta")))
      val wSweep = Window.partitionBy("user_id")
        .orderBy(col("t"), col("delta").desc, col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      marks.withColumn("live", sum("delta").over(wSweep))
        .groupBy((col("user_id") % 8).as("principal"))
        .agg((count(lit(1)) / 2).cast("long").as("n_sessions"),
          max("live").as("peak_concurrent"),
          sum(when(col("delta") === 1L && col("live") >= 2L, 1L)
            .otherwise(0L)).as("overlapping_starts"))
        .withColumn("overlap_ppm",
          expr("(overlapping_starts * 1000000) DIV n_sessions"))
        .orderBy("principal")
    }),

    // A/B exposure integrity — the experimentation-hygiene audit beside
    // agg_ab_srm (which checks ASSIGNMENT ratios; this one checks that a
    // user ever SEES one variant): assignment is the deterministic
    // hash(user, flag), but a planted client-side override flips every
    // 97th event — those users are CONTAMINATED (both variants observed)
    // and their data is unusable for the readout. Per flag: exposed
    // users, contaminated users + ppm, exposure events. Two rollups, the
    // distinct-variant count per (flag, user) in between.
    "service_ab_exposure_integrity" -> ((s, d) => {
      val exposures = Tables.events(s, d)
        .select(col("user_id"), col("event_id"))
        .withColumn("flag", (col("event_id") % 3).as("flag"))
        .withColumn("assigned", expr(
          "CAST(conv(substring(md5(concat(CAST(user_id AS STRING), ':f', CAST(flag AS STRING))), 1, 6), 16, 10) AS BIGINT) % 2"))
        .withColumn("seen",
          when(col("event_id") % 97 === 13, lit(1L) - col("assigned"))
            .otherwise(col("assigned")))
      exposures.groupBy("flag", "user_id")
        .agg(count(lit(1)).as("events"),
          countDistinct("seen").as("variants_seen"))
        .groupBy("flag")
        .agg(count(lit(1)).as("exposed_users"),
          sum(when(col("variants_seen") >= 2, 1L).otherwise(0L))
            .as("contaminated_users"),
          sum("events").as("exposure_events"))
        .withColumn("contamination_ppm",
          expr("(contaminated_users * 1000000) DIV exposed_users"))
        .orderBy("flag")
    }),

    // Conversation context-growth plan — the serving-capacity question
    // for multi-turn chat (when does a conversation blow the 4096-token
    // context?): per conversation (user) the turns accumulate
    // floor(value)+10 tokens each in the total order; graded per
    // principal: conversations' turn count, token mass, the first turn
    // index past the limit (min over the window-flagged rows) and the
    // overflow-turn mass that would need truncation/summarization. One
    // cumsum window + one rollup.
    "llm_context_growth_plan" -> ((s, d) => {
      val wc = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("ts_us"),
          (expr("CAST(FLOOR(value) AS BIGINT)") + 10L).as("turn_tokens"))
        .withColumn("cum_tokens", sum("turn_tokens").over(wc))
        .withColumn("turn_idx", row_number().over(
          Window.partitionBy("user_id").orderBy("ts_us", "event_id")))
        .groupBy((col("user_id") % 8).as("principal"))
        .agg(count(lit(1)).as("n_turns"),
          sum("turn_tokens").as("token_mass"),
          min(when(col("cum_tokens") > 4096L, col("turn_idx")))
            .as("first_overflow_turn"),
          sum(when(col("cum_tokens") > 4096L, 1L).otherwise(0L))
            .as("overflow_turns"))
        .withColumn("overflow_ppm",
          expr("(overflow_turns * 1000000) DIV n_turns"))
        .orderBy("principal")
    })
  )

  val oracles: Map[String, String] = Map(
    "service_concurrent_sessions" ->
      """WITH sess AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
        |    CAST(FLOOR(value * 1000000) AS BIGINT) AS dur_us
        |  FROM events),
        |marks AS (
        |  SELECT user_id, event_id, ts_us AS t, CAST(1 AS BIGINT) AS delta FROM sess
        |  UNION ALL
        |  SELECT user_id, event_id, ts_us + dur_us, CAST(-1 AS BIGINT) FROM sess),
        |sw AS (
        |  SELECT user_id, delta,
        |    SUM(delta) OVER (PARTITION BY user_id
        |      ORDER BY t, delta DESC, event_id
        |      ROWS UNBOUNDED PRECEDING) AS live
        |  FROM marks)
        |SELECT user_id % 8 AS principal,
        |  CAST(COUNT(*) // 2 AS BIGINT) AS n_sessions,
        |  CAST(MAX(live) AS BIGINT) AS peak_concurrent,
        |  CAST(SUM(CASE WHEN delta = 1 AND live >= 2 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS overlapping_starts,
        |  (CAST(SUM(CASE WHEN delta = 1 AND live >= 2 THEN 1 ELSE 0 END) AS BIGINT)
        |    * 1000000) // (CAST(COUNT(*) AS BIGINT) // 2) AS overlap_ppm
        |FROM sw GROUP BY 1 ORDER BY principal""".stripMargin,

    "service_ab_exposure_integrity" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_id % 3 AS flag,
        |    ('0x' || substring(md5(CAST(user_id AS VARCHAR) || ':f' ||
        |      CAST(event_id % 3 AS VARCHAR)), 1, 6))::BIGINT % 2 AS assigned
        |  FROM events),
        |seen AS (
        |  SELECT flag, user_id,
        |    CASE WHEN event_id % 97 = 13 THEN 1 - assigned ELSE assigned END AS seen
        |  FROM e),
        |pu AS (
        |  SELECT flag, user_id, CAST(COUNT(*) AS BIGINT) AS events,
        |    CAST(COUNT(DISTINCT seen) AS BIGINT) AS variants_seen
        |  FROM seen GROUP BY 1, 2)
        |SELECT flag, CAST(COUNT(*) AS BIGINT) AS exposed_users,
        |  CAST(SUM(CASE WHEN variants_seen >= 2 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS contaminated_users,
        |  CAST(SUM(events) AS BIGINT) AS exposure_events,
        |  (CAST(SUM(CASE WHEN variants_seen >= 2 THEN 1 ELSE 0 END) AS BIGINT)
        |    * 1000000) // CAST(COUNT(*) AS BIGINT) AS contamination_ppm
        |FROM pu GROUP BY 1 ORDER BY flag""".stripMargin,

    "llm_context_growth_plan" ->
      """WITH t AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
        |    CAST(FLOOR(value) AS BIGINT) + 10 AS turn_tokens
        |  FROM events),
        |w AS (
        |  SELECT user_id, turn_tokens,
        |    SUM(turn_tokens) OVER win AS cum_tokens,
        |    CAST(ROW_NUMBER() OVER win AS INT) AS turn_idx
        |  FROM t WINDOW win AS (PARTITION BY user_id ORDER BY ts_us, event_id))
        |SELECT user_id % 8 AS principal, CAST(COUNT(*) AS BIGINT) AS n_turns,
        |  CAST(SUM(turn_tokens) AS BIGINT) AS token_mass,
        |  CAST(MIN(CASE WHEN cum_tokens > 4096 THEN turn_idx END) AS INT)
        |    AS first_overflow_turn,
        |  CAST(SUM(CASE WHEN cum_tokens > 4096 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS overflow_turns,
        |  (CAST(SUM(CASE WHEN cum_tokens > 4096 THEN 1 ELSE 0 END) AS BIGINT)
        |    * 1000000) // CAST(COUNT(*) AS BIGINT) AS overflow_ppm
        |FROM w GROUP BY 1 ORDER BY principal""".stripMargin
  )
}
