package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic checks for the round-10 wave-18 ops beyond the oracle gate. */
class Round10Wave18Spec extends AnyFunSuite with SparkFixture {

  test("llm_spec_decode_accept: run lengths in range, short runs dominate at p=1/4") {
    val rows = SparkEntry.queries("llm_spec_decode_accept")(spark, sf).collect()
    val n = Tables.documents(spark, sf).where(col("doc_id") % 10 === 7).count()
    assert(rows.map(_.getLong(1)).sum == n, "every task lands in one bucket")
    rows.foreach(r => assert(r.getLong(0) >= 0 && r.getLong(0) <= 8))
    // geometric(3/4-stop): accepted=0 is the modal bucket by a wide margin
    val by = rows.map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(by.getOrElse(0L, 0L) > by.getOrElse(2L, 0L),
      "p=1/4 match rate must make short runs dominate")
  }

  test("llm_grpo_advantage: group advantages sum to zero and split around the mean") {
    val rows = SparkEntry.queries("llm_grpo_advantage")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(5) == 0, s"sum of (r*n - sum_r) must vanish per group: $r")
      assert(r.getLong(2) >= 1 && r.getLong(2) < r.getLong(1),
        s"someone above and someone at-or-below the mean: $r")
      assert(r.getLong(3) > 0 && r.getLong(4) < 0,
        s"extremes must straddle the mean: $r")
    }
  }

  test("win_rsi: oscillator bounded, neutral only when the window is flat") {
    val rows = SparkEntry.queries("win_rsi")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(3) >= 0 && r.getLong(3) <= 1000,
      s"RSI outside [0, 1000]: $r"))
  }
}
