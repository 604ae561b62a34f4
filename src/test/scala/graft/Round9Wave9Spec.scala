package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic checks for the round-9 wave-9 operators beyond the oracle
  * gate: assortativity bounds, Gini algebra, rolling-correlation range,
  * and hashing-trick conservation.
  */
class Round9Wave9Spec extends AnyFunSuite with SparkFixture {

  test("graph_assortativity: one row, r in [-1, 1], num/den consistency") {
    val rows = SparkEntry.queries("graph_assortativity")(spark, SparkFixture.sf001).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getLong(0) > 0 && r.getLong(0) % 2 == 0,
      "bi-directed edge count must be positive and even")
    val rv = r.getDouble(6)
    assert(rv >= -1.0 - 1e-12 && rv <= 1.0 + 1e-12, s"assortativity out of [-1,1]: $rv")
    assert(math.abs(rv - r.getLong(4).toDouble / r.getLong(5)) < 1e-12)
    assert(r.getLong(5) > 0, "variance denominator must be positive on a non-regular graph")
  }

  test("agg_gini: coefficients in [0,1); equality lower bound respected") {
    val rows = SparkEntry.queries("agg_gini")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val g = r.getDouble(5)
      assert(g >= 0.0 && g < 1.0, s"gini out of range: $r")
      assert(math.abs(g - r.getLong(3).toDouble / r.getLong(4)) < 1e-12)
      // max-inequality bound: G <= (n-1)/n
      val n = r.getLong(1).toDouble
      assert(g <= (n - 1.0) / n + 1e-12)
    }
  }

  test("win_rolling_corr: every r in [-1, 1]; windows are exactly 7 days") {
    val rows = SparkEntry.queries("win_rolling_corr")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) == 7L)
      if (!r.isNullAt(5)) {
        val c = r.getDouble(5)
        assert(c >= -1.0 - 1e-12 && c <= 1.0 + 1e-12, s"correlation out of [-1,1]: $r")
      }
    }
  }

  test("llm_feature_hashing: bucket domain, token conservation, |feat| <= count") {
    val sfDir = sf
    val rows = SparkEntry.queries("llm_feature_hashing")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) >= 0 && r.getLong(1) <= 15, s"bucket out of domain: $r")
      assert(math.abs(r.getLong(3)) <= r.getLong(2), s"|signed sum| exceeds count: $r")
      // parity law: feat ≡ count (mod 2) — each token contributes ±1
      assert(((r.getLong(2) - r.getLong(3)) % 2) == 0, s"sign parity violated: $r")
    }
    val totalTokens = Tables.documents(spark, sfDir)
      .select(sum(size(split(col("text"), " ")))).collect()(0).getLong(0)
    assert(rows.map(_.getLong(2)).sum == totalTokens,
      "bucketed token counts must conserve the corpus token count")
  }
}
