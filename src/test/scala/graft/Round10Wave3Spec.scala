package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic checks for the round-10 wave-3 ops beyond the oracle gate:
  * Katz centrality, the delta-method ratio CI, and the Avro container
  * ingest path.
  */
class Round10Wave3Spec extends AnyFunSuite with SparkFixture {

  test("graph_katz: baseline floor, attenuation bound, in-degree ordering") {
    val rows = SparkEntry.queries("graph_katz")(spark, sf).collect()
    assert(rows.length == 25, "one row per nation")
    rows.foreach { r =>
      val k = r.getLong(1)
      // beta floor: every node scores at least the baseline
      assert(k >= 1000000L, s"katz below beta: $r")
      // alpha*indeg <= 24/200 bounds the geometric tail well under 2*beta
      assert(k < 2000000L, s"katz above the attenuation bound: $r")
    }
    // at least one node must collect enough in-walk mass to clear beta
    // (a fixture where NO node does would mean the recurrence never fired)
    assert(rows.exists(_.getLong(1) > 1000000L), "no node above beta: recurrence dead")
  }

  test("agg_delta_method_ci: CI brackets the point estimate with positive width") {
    val rows = SparkEntry.queries("agg_delta_method_ci")(spark, sf).collect()
    assert(rows.length == 5, "one row per market segment")
    rows.foreach { r =>
      val (n, ratio, lo, hi) =
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(n > 1, s"delta method needs n > 1: $r")
      assert(lo < ratio && ratio < hi, s"CI must bracket the estimate: $r")
      assert(hi - lo < ratio, s"CI implausibly wide at this n: $r")
      assert(ratio > 0, s"revenue per order must be positive: $r")
    }
  }

  test("source_avro_ingest: record conservation through the container roundtrip") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("source_avro_ingest")(spark, sf).collect()
    val direct = Tables.orders(spark, sf).where(col("o_orderkey") % 10 === 0)
    assert(rows.map(_.getLong(1)).sum == direct.count(),
      "row count must survive the Avro write/decode")
    // decode parallelism: the scan must expose one task per container file
    val files = new java.io.File(graft.ops.Scratch.opDir("avroingest", sf))
      .listFiles.count(_.getName.endsWith(".avro"))
    assert(files == 4, "fixture stages 4 container files for file-granular parallelism")
  }
}
