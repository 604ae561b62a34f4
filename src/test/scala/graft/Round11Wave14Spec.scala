package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic checks for round-11 wave 14: RAG citation audit, Ichimoku,
  * odds ratio, on-balance volume.
  */
class Round11Wave14Spec extends AnyFunSuite with SparkFixture {

  test("llm_rag_citation_check: ~20% hallucination by construction, ledger conserves") {
    val r = SparkEntry.queries("llm_rag_citation_check")(spark, sf).collect().head
    val (nAns, nCit, nValid) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(nCit == 3 * nAns, "every answer cites exactly 3")
    assert(r.getLong(3) <= nValid, "supported implies valid")
    assert(r.getLong(5) + r.getLong(6) == 1000000 ||
      r.getLong(5) + r.getLong(6) == 999999, "valid + halluc ppm partition")
    // span is 1.25×max_id → ~20% of citations miss; md5 noise band
    assert(r.getLong(6) > 120000 && r.getLong(6) < 280000, s"halluc_ppm: $r")
    assert(r.getLong(4) <= nAns)
  }

  test("win_ichimoku: midpoint scaling and cloud verdict are consistent") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("win_ichimoku")(spark, sf).collect()
    assert(rows.nonEmpty)
    // global per-type cent bounds — every ×2 midpoint must live inside them
    val bounds = Tables.events(spark, sf)
      .select(col("event_type"), floor(col("value") * 100).cast("long").as("c"))
      .groupBy("event_type").agg(min("c").as("lo"), max("c").as("hi"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    rows.foreach { r =>
      val (lo, hi) = bounds(r.getString(0))
      val cents = r.getLong(2)
      Seq(r.getLong(3), r.getLong(4)).foreach { x2 =>
        assert(x2 >= 2 * lo && x2 <= 2 * hi, s"midpoint ×2 out of range: $r")
      }
      // current close participates in its own 9-bar window: 2·cents within
      // [tenkan_x2 - (hi9-lo9), tenkan_x2 + (hi9-lo9)] ⊆ [2lo9, 2hi9]; the
      // emitted invariant that needs no raw hi/lo is lo ≤ cents ≤ hi
      assert(cents >= lo && cents <= hi)
      if (!r.isNullAt(5) && !r.isNullAt(6)) {
        val above = r.getBoolean(8)
        assert(above == (cents * 4 > r.getLong(5) && cents * 4 > r.getLong(6)),
          s"cloud verdict must match its spans: $r")
      }
    }
  }

  test("agg_odds_ratio: planted lift recovered, association flagged") {
    val r = SparkEntry.queries("agg_odds_ratio")(spark, sf).collect().head
    val (a, b, c, d) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(a + b > 0 && c + d > 0)
    // risk 45% vs 30% → OR = (.45/.55)/(.3/.7) ≈ 1.909, RR = 1.5
    assert(r.getLong(4) > 1500000 && r.getLong(4) < 2400000, s"or_ppm: $r")
    assert(r.getLong(5) > 1300000 && r.getLong(5) < 1700000, s"rr_ppm: $r")
    assert(r.getBoolean(6), "planted lift must be significant")
  }

  test("win_obv: extremes bracket the final value") {
    val rows = SparkEntry.queries("win_obv")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (fin, mx, mn) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(mn <= fin && fin <= mx, s"running extremes bracket the end: $r")
      assert(mn <= 0 || mx >= 0)
    }
  }
}
