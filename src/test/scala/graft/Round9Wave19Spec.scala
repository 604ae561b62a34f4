package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic checks for the round-9 wave-19 operators beyond the oracle
  * gate: interval-union bounds, peak definition, and byte-exact
  * multi-line CSV parsing.
  */
class Round9Wave19Spec extends AnyFunSuite with SparkFixture {

  test("win_interval_coverage: coverage bounded by [window, n·window]; segments sane") {
    val sfDir = sf
    val rows = SparkEntry.queries("win_interval_coverage")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val W = 3600000000L
    rows.foreach { r =>
      val (n, segs, cov) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(segs >= 1 && segs <= n)
      // union of n hour-windows covers at least one window and at most n
      assert(cov >= W && cov <= n * W, s"coverage outside bounds: $r")
      // each segment covers at least one full window
      assert(cov >= segs * W, s"a segment shorter than one window: $r")
      assert(r.getLong(4) <= 1000000L)
    }
    assert(rows.map(_.getLong(1)).sum == Tables.events(spark, sfDir).count())
  }

  test("win_peak_detect: every peak strictly beats neighbors and the 10%-over-mean bar") {
    val sfDir = SparkFixture.sf001
    val rows = SparkEntry.queries("win_peak_detect")(spark, sfDir).collect()
    rows.foreach { r =>
      val (x, prev, next) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(x > prev && x > next, s"not a local max: $r")
    }
    // cross-check the prominence bar against the recomputed series means
    val tot = Tables.events(spark, sfDir)
      .groupBy(col("event_type"), to_date(col("ts"))).agg(count(lit(1)).as("x"))
      .groupBy("event_type").agg(count(lit(1)).as("n"), sum("x").as("s"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    rows.foreach { r =>
      val (n, s) = tot(r.getString(0))
      assert(r.getLong(2) * n * 10 > s * 11, s"peak below the prominence bar: $r")
    }
  }

  test("source_csv_multiline: embedded newline and escaped quotes parse byte-exactly") {
    val rows = SparkEntry.queries("source_csv_multiline")(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    assert(rows.size == 3, "three records despite four physical content lines")
    assert(rows(0L) == (("alpha", 17L, 1L)), "newline-spanning field mangled")
    assert(rows(1L) == (("beta", 12L, 0L)), "escaped quotes mangled")
    assert(rows(2L) == (("gamma", 5L, 0L)))
  }
}
