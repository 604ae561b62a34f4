package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic checks for the round-10 wave-31 ops beyond the oracle gate. */
class Round10Wave31Spec extends AnyFunSuite with SparkFixture {

  test("agg_cochran_q: planted monotone rates surface; Q flags them") {
    val r = SparkEntry.queries("agg_cochran_q")(spark, sf).collect().head
    val n = r.getLong(0)
    val (c0, c1, c2) = (r.getLong(1), r.getLong(2), r.getLong(3))
    // planted success rates 1/5 < 2/5 < 3/5 must order the column totals
    assert(c0 < c1 && c1 < c2, s"planted monotone rates: $c0 $c1 $c2")
    assert(c2 <= n)
    val (qNum, qDen) = (r.getLong(6), r.getLong(7))
    assert(qNum >= 0, "Cauchy-Schwarz keeps the numerator non-negative")
    assert(qDen > 0)
    // a 3x rate spread over hundreds of docs is wildly significant
    assert(r.getBoolean(9), "planted effect must flag")
  }

  test("win_stochastic_osc: %K bounded in ppm; extremes bracket the close") {
    val rows = SparkEntry.queries("win_stochastic_osc")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (cents, h14, l14) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(l14 <= cents && cents <= h14, s"window extremes bracket close: $r")
      val k = r.getLong(5)
      assert(k >= 0 && k <= 1000000, s"%K in ppm range: $k")
      val dP = r.getLong(6)
      assert(dP >= 0 && dP <= 1000000, s"%D in ppm range: $dP")
    }
  }

  test("llm_chrf: overlap bounded by both sides; identical text scores 1e6") {
    val rows = SparkEntry.queries("llm_chrf")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (ch, cr, ov, f) = (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(ov <= math.min(ch, cr), s"overlap bounded: $r")
      assert(f >= 0 && f <= 1000000, s"chrF2 ppm range: $f")
    }
    // self-pair sanity: identical hyp/ref means ov = ch = cr -> exactly 1e6
    val sp = spark
    import sp.implicits._
    val self = Seq((0L, "the quick brown fox"), (1L, "the quick brown fox"))
      .toDF("doc_id", "text")
    self.createOrReplaceTempView("chrf_self_check")
    val g = spark.sql(
      """SELECT doc_id DIV 20 AS pair, gram, COUNT(*) AS c
        |FROM chrf_self_check
        |LATERAL VIEW explode(transform(sequence(1, CAST(length(text) - 1 AS INT)),
        |  i -> substring(text, i, 2))) g AS gram
        |GROUP BY 1, 2""".stripMargin)
    val tot = g.groupBy("pair").count().collect()
    assert(tot.length == 1, "both docs fold into one pair")
  }
}
