package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic checks for the round-10 wave-21 ops beyond the oracle gate. */
class Round10Wave21Spec extends AnyFunSuite with SparkFixture {

  test("llm_needle_gen: every depth splices losslessly inside the document") {
    val rows = SparkEntry.queries("llm_needle_gen")(spark, sf).collect()
    val n = Tables.documents(spark, sf).where(col("doc_id") % 8 === 1).count()
    assert(rows.map(_.getLong(1)).sum == n)
    rows.foreach { r =>
      assert(r.getBoolean(5), s"needle length not conserved: $r")
      assert(r.getLong(0) >= 0 && r.getLong(0) <= 10)
      assert(r.getLong(3) >= 0, "offsets non-negative")
    }
    // depth 0 splices at the very front
    rows.find(_.getLong(0) == 0L).foreach(r => assert(r.getLong(4) == 0))
  }

  test("agg_mcnemar: discordant cells drive the verdict; planted gap detected") {
    val r = SparkEntry.queries("agg_mcnemar")(spark, sf).collect().head
    val (n, b, c) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(b + c <= n)
    assert(r.getLong(3) == 100 * (b - c) * (b - c))
    assert(r.getLong(4) == 384 * (b + c))
    // model A is planted 10 points more accurate: the paired test sees it
    assert(b > c, "A's extra accuracy must show as excess discordance")
    assert(r.getBoolean(5), "a 10-point gap over the corpus is significant")
  }

  test("agg_runs_test: runs bounded, z ties out to the closed form") {
    val r = SparkEntry.queries("agg_runs_test")(spark, sf).collect().head
    val (n, n1, n2, runs, num) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    assert(runs >= 1 && runs <= n)
    assert(num == (runs - 1) * n - 2 * n1 * n2)
    val expect = num.toDouble /
      math.sqrt((2.0 * n1 * n2) * (2.0 * n1 * n2 - n) / (n - 1).toDouble)
    assert(math.abs(r.getDouble(5) - expect) < 1e-9)
  }
}
