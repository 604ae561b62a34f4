package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic checks for the round-9 operators beyond the oracle gate:
  * stat-sketch verdicts (freqItems/sampleBy) and the lakehouse
  * re-clustering maintenance commit.
  */
class Round9OpsSpec extends AnyFunSuite with SparkFixture {

  test("agg_freq_items: every ~20% stratum is reported frequent and sampled near its fraction") {
    val rows = SparkEntry.queries("agg_freq_items")(spark, sf).collect()
    assert(rows.length == 5, s"expected the 5 market segments, got ${rows.length}")
    // at support 0.1 every ~20% segment carries the sketch guarantee
    assert(rows.forall(_.getBoolean(2)), "freqItems missed a >=support stratum")
    assert(rows.forall(_.getBoolean(3)), "sampleBy count outside 5-sigma of its fraction")
    // direct bound, independent of the op's own verdict arithmetic: the
    // deterministic seed-42 sample of each stratum is 20% +/- 5 sigma
    val cust = Tables.customer(spark, sf)
    val strata = cust.select("c_mktsegment").distinct().collect().map(_.getString(0))
    val got = cust.stat.sampleBy("c_mktsegment", strata.map(_ -> 0.2).toMap, 42L)
      .groupBy("c_mktsegment").agg(count(lit(1))).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val (seg, n) = (r.getString(0), r.getLong(1))
      val s = got.getOrElse(seg, 0L).toDouble
      val sigma = math.sqrt(0.2 * 0.8 * n)
      assert(math.abs(s - 0.2 * n) <= 5 * sigma, s"$seg: sampled $s of $n")
    }
  }
}
