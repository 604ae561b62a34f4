package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic checks for the round-10 wave-25 ops beyond the oracle gate. */
class Round10Wave25Spec extends AnyFunSuite with SparkFixture {

  test("agg_ohlc_candles: open/close inside [low, high], volume positive") {
    val rows = SparkEntry.queries("agg_ohlc_candles")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (vol, open, high, low, close) =
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))
      assert(vol >= 1)
      assert(low <= high)
      assert(open >= low && open <= high, s"open outside the range: $r")
      assert(close >= low && close <= high, s"close outside the range: $r")
      if (vol == 1) assert(open == close && open == high && high == low)
    }
  }

  test("llm_retrieval_mrr: exact rational MRR consistent with its own counters") {
    val r = SparkEntry.queries("llm_retrieval_mrr")(spark, sf).collect().head
    val (n, num, at1, at5, mrr) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    assert(at1 <= at5 && at5 <= n)
    // bounds: every probe contributes between LCM/20 and LCM
    assert(num >= n * (232792560L / 20) && num <= n * 232792560L)
    assert(mrr == num * 1000000L / (232792560L * n))
    // a uniform relevant rank averages 1/rank ~ 0.18; sanity band
    assert(mrr > 100000 && mrr < 450000, s"MRR far outside the uniform band: $mrr")
  }
}
