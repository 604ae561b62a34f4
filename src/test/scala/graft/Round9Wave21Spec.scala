package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic checks for the round-9 wave-21 operators beyond the oracle
  * gate: MASE algebra, vocabulary-overlap symmetry bounds, and the
  * schema-diff classification.
  */
class Round9Wave21Spec extends AnyFunSuite with SparkFixture {

  test("agg_forecast_backtest: evaluation windows align and MASE is the exact ratio") {
    val rows = SparkEntry.queries("agg_forecast_backtest")(spark, sf).collect()
    assert(rows.nonEmpty)
    val days = Tables.events(spark, sf)
      .groupBy(col("event_type")).agg(countDistinct(to_date(col("ts"))).as("nd"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      assert(r.getLong(1) == days(r.getString(0)) - 7,
        s"evaluation must cover every day past the 7-day warmup: $r")
      assert(r.getLong(4) == r.getLong(2) * 1000000L / r.getLong(3), s"MASE mislabeled: $r")
    }
  }

  test("llm_vocab_overlap: all canonical pairs present; intersection bounded by both sizes") {
    val rows = SparkEntry.queries("llm_vocab_overlap")(spark, sf).collect()
    val langs = Tables.documents(spark, sf).select("lang").distinct().count()
    assert(rows.length == langs * (langs - 1) / 2, "one row per unordered language pair")
    rows.foreach { r =>
      assert(r.getString(0) < r.getString(1))
      val (na, nb, shared) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(shared <= na.min(nb), s"intersection exceeds a vocabulary: $r")
      assert(r.getLong(5) <= 1000000L)
      assert(shared > 0, "synthetic corpora share at least numerals/markup")
    }
  }

  test("warehouse_schema_diff: the three scripted edits classify exactly") {
    val rows = SparkEntry.queries("warehouse_schema_diff")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getString(2), r.getString(3))).toMap
    assert(rows.size == 5)
    assert(rows("o_custkey")._3 == "removed")
    assert(rows("o_orderpriority")._3 == "added")
    assert(rows("o_totalprice") == (("float", "double", "type_changed")))
    assert(rows("o_orderkey")._3 == "unchanged" && rows("o_orderstatus")._3 == "unchanged")
  }
}
