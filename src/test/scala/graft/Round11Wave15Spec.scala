package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic checks for round-11 wave 15: Brier score, Youden's J,
  * Wilcoxon signed-rank, unicode anomaly screen, ATR.
  */
class Round11Wave15Spec extends AnyFunSuite with SparkFixture {

  test("agg_brier_score: propriety — the calibrated forecaster wins") {
    val r = SparkEntry.queries("agg_brier_score")(spark, sf).collect().head
    val (cal, over) = (r.getLong(1), r.getLong(2))
    assert(r.getBoolean(3), "calibrated_wins must hold (Brier is proper)")
    assert(over > cal)
    // E[p(1-p)] = 1/6 for uniform p with y ~ Bernoulli(p): ~1.667e11 ppm²
    assert(cal > 140000000000L && cal < 190000000000L, s"brier_cal: $cal")
    // overconfident adds E[(q-p)²] ≈ 1/48: ~2.08e10 more
    assert(over - cal > 8000000000L, s"margin: ${over - cal}")
  }

  test("agg_youden_j: argmax lands on the planted plateau") {
    val r = SparkEntry.queries("agg_youden_j")(spark, sf).collect().head
    val (thr, jppm) = (r.getLong(0), r.getLong(6))
    // J(thr) plateaus at 300k/700k ≈ 428571 ppm for thr ∈ [300k, 700k];
    // sampling noise perturbs which plateau point wins, never the level
    assert(thr >= 250000L && thr <= 700000L, s"thr: $thr")
    assert(jppm > 370000L && jppm < 490000L, s"j_ppm: $jppm")
    assert(r.getLong(5) > 0, "argmax numerator positive by construction")
    assert(r.getLong(1) <= r.getLong(3) && r.getLong(2) <= r.getLong(4),
      "TP ≤ P, FP ≤ N")
  }

  test("agg_wilcoxon_signed_rank: planted +25 shift detected, ranks conserve") {
    val r = SparkEntry.queries("agg_wilcoxon_signed_rank")(spark, sf).collect().head
    val (n, w2, e2) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(r.getBoolean(4), "planted shift must be significant")
    assert(w2 > e2, "positive shift ⇒ W⁺ above its null mean")
    // Σ over ALL diffs of r2 = 2·Σrank = n(n+1); positives hold ~75/100
    assert(w2 <= n * (n + 1), "W⁺ₓ₂ bounded by the total ×2 rank mass")
    assert(w2 * 10 > n * (n + 1) * 6, "positives carry well over half the mass")
  }

  test("llm_unicode_anomaly: planted pollution counts exactly recovered") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("llm_unicode_anomaly")(spark, sf).collect()
    val zw = rows.map(_.getLong(3)).sum
    val bidi = rows.map(_.getLong(4)).sum
    val repl = rows.map(_.getLong(5)).sum
    val flagged = rows.map(_.getLong(2)).sum
    val docs = Tables.documents(spark, sf)
    val n13 = docs.where(expr("doc_id % 13 = 0")).count()
    val n29 = docs.where(expr("doc_id % 29 = 0 AND doc_id % 13 <> 0")).count()
    assert(zw == n13, s"one zero-width per 13th doc: $zw vs $n13")
    assert(bidi == n13, s"one RLO per 13th doc: $bidi vs $n13")
    assert(repl == n29, s"one replacement char per non-13th 29th doc")
    assert(flagged == n13 + n29, "flagged = exactly the planted docs")
    rows.foreach { r =>
      assert(r.getLong(6) == r.getLong(2) * 1000000L / r.getLong(1),
        s"flagged_ppm consistency: $r")
    }
  }

  test("win_atr: TR dominates the bar range, ATR×14 dominates TR") {
    val rows = SparkEntry.queries("win_atr")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) % 7 == 3, "sampled rows only")
      val (tr, atr) = (r.getLong(3), r.getLong(4))
      assert(tr >= 0, "TR ≥ h−l ≥ 0 (spreads are non-negative)")
      assert(atr >= tr, "a 14-bar sum of non-negative TRs covers its last term")
    }
  }
}
