package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic checks for the round-9 wave-8 operators beyond the oracle
  * gate: Benford share conservation, seasonality index algebra,
  * modularity identities, and the novelty-curve boundary laws.
  */
class Round9Wave8Spec extends AnyFunSuite with SparkFixture {

  test("agg_benford: all nine digits present, shares conserve to 1e6 ppm") {
    val rows = SparkEntry.queries("agg_benford")(spark, sf).collect()
    assert(rows.map(_.getLong(0)).sorted.toSeq == (1L to 9L))
    val nOrders = Tables.orders(spark, sf).count()
    assert(rows.map(_.getLong(1)).sum == nOrders)
    val ppmSum = rows.map(_.getLong(2)).sum
    assert(ppmSum > 1000000L - 9 && ppmSum <= 1000000L,
      s"observed ppm shares do not conserve: $ppmSum")
    // published Benford constants sum to ~1e6 too (floored)
    val expSum = rows.map(_.getLong(3)).sum
    assert(expSum > 1000000L - 9 && expSum <= 1000000L)
  }

  test("agg_seasonality: dow in [0,6]; per-type counts tie out to totals") {
    val rows = SparkEntry.queries("agg_seasonality")(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getLong(1) >= 0 && r.getLong(1) <= 6))
    assert(rows.forall(_.getLong(4) > 0), "a live dow must have a positive index")
    val daily = Tables.events(spark, sf)
      .groupBy(col("event_type"), to_date(col("ts"))).agg(count(lit(1)).as("x"))
      .groupBy("event_type").agg(sum("x").as("n"), count(lit(1)).as("days"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    rows.groupBy(_.getString(0)).foreach { case (et, rs) =>
      assert(rs.map(_.getLong(2)).sum == daily(et)._1, s"$et: dow counts != total events")
      assert(rs.map(_.getLong(3)).sum == daily(et)._2, s"$et: dow days != total days")
    }
  }

  test("graph_modularity: degree sum is 2m, intra weight <= m, Q in (-1, 1)") {
    val rows = SparkEntry.queries("graph_modularity")(spark, SparkFixture.sf001).collect()
    assert(rows.nonEmpty)
    val qDen = rows.head.getLong(5)
    assert(rows.forall(_.getLong(5) == qDen), "q_den = 4m² must be global")
    // 4m² → m
    val m = math.round(math.sqrt(qDen.toDouble / 4.0))
    assert(4L * m * m == qDen, "q_den is not a perfect 4m²")
    assert(rows.map(_.getLong(3)).sum == 2 * m, "sum of community degrees must be 2m")
    assert(rows.map(_.getLong(2)).sum <= m, "intra-community weight cannot exceed m")
    rows.foreach { r =>
      assert(math.abs(r.getDouble(6) - r.getLong(4).toDouble / r.getLong(5)) < 1e-12)
    }
    val q = rows.map(_.getDouble(6)).sum
    assert(q > -1.0 && q < 1.0, s"total modularity out of range: $q")
  }

  test("llm_ngram_novelty: the earliest doc is fully novel; ppm bounded; owners conserve") {
    val rows = SparkEntry.queries("llm_ngram_novelty")(spark, sf).collect()
    assert(rows.nonEmpty)
    val first = rows.minBy(_.getLong(0))
    assert(first.getLong(3) == 1000000L, "the first doc must be 100% novel")
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1), s"novel > total shingles: $r")
      assert(r.getLong(3) >= 0 && r.getLong(3) <= 1000000L)
    }
    // every distinct trigram has exactly one first owner
    val distinctShingles = Tables.documents(spark, sf)
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .where(size(col("t")) > 2)
      .select(explode(array_distinct(expr(
        "transform(sequence(0, size(t) - 3), i -> concat_ws(' ', t[i], t[i+1], t[i+2]))"))).as("s"))
      .select(countDistinct("s")).collect()(0).getLong(0)
    assert(rows.map(_.getLong(2)).sum == distinctShingles,
      "first-owner counts must conserve the distinct trigram set")
  }
}
