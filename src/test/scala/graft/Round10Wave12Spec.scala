package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic checks for the round-10 wave-12 ops beyond the oracle gate. */
class Round10Wave12Spec extends AnyFunSuite with SparkFixture {

  test("fn_xpath: extraction recovers the authored columns exactly") {
    val rows = SparkEntry.queries("fn_xpath")(spark, sf).collect()
    val direct = Tables.orders(spark, sf)
      .where(col("o_orderkey") % 5 === 0)
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.length == direct.size)
    rows.foreach(r => assert(r.getLong(1) == direct(r.getString(0)),
      s"xpath dropped or duplicated rows: $r"))
  }

  test("fn_width_bucket: buckets tile the range, extremes in the edge buckets") {
    val rows = SparkEntry.queries("fn_width_bucket")(spark, sf).collect()
    val n = Tables.orders(spark, sf).count()
    assert(rows.map(_.getLong(1)).sum == n)
    rows.foreach { r =>
      val (b, mn, mx) = (r.getLong(0), r.getLong(2), r.getLong(3))
      if (b >= 1 && b <= 10) {
        assert(mn >= (b - 1) * 6000000L && mx < b * 6000000L,
          s"bucket $b holds out-of-band cents: $r")
      }
    }
  }

  test("agg_hodges_lehmann: the estimate sits between the sample extremes") {
    // round 11 replaced the proportional %100 sample with a FIXED-size
    // hash-top-k (k = 512) sample — recompute the same sample here
    val r = SparkEntry.queries("agg_hodges_lehmann")(spark, sf).collect().head
    val xs = Tables.orders(spark, sf)
      .select(col("o_orderkey").as("i"),
        round(col("o_totalprice") * 100).cast("bigint").as("x"),
        expr("CAST(conv(substring(md5(concat('hl:', CAST(o_orderkey AS STRING))), 1, 8), 16, 10) AS BIGINT)").as("h"))
      .orderBy("h", "i").limit(512)
      .select("x").collect().map(_.getLong(0))
    val k = xs.length.toLong
    assert(r.getLong(0) == k * (k + 1) / 2, "pair count must be C(k+1,2)")
    assert(r.getLong(2) >= xs.min && r.getLong(2) <= xs.max,
      "HL estimate outside the sample hull")
  }

  test("mm_layout_reading_order: checksum is permutation-sensitive and complete") {
    val rows = SparkEntry.queries("mm_layout_reading_order")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) == 12, "every page carries 12 boxes")
      // checksum bounds: identity order gives sum k*(k+1) over 0..11 with
      // rank=box+1; any checksum must lie within the permutation hull
      val lo = (0 until 12).map(b => b.toLong * (12 - b)).sum
      val hi = (0 until 12).map(b => b.toLong * (b + 1)).sum
      assert(r.getLong(2) >= lo && r.getLong(2) <= hi, s"checksum out of hull: $r")
    }
  }
}
