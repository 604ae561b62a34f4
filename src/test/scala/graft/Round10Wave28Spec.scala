package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic checks for the round-10 wave-28 ops beyond the oracle gate. */
class Round10Wave28Spec extends AnyFunSuite with SparkFixture {

  test("agg_spearman: rho bounded; d2 vanishes iff the rankings agree") {
    val r = SparkEntry.queries("agg_spearman")(spark, sf).collect().head
    val (n, d2, rho) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(n > 10)
    assert(rho >= -1000000 && rho <= 1000000, s"rho out of [-1,1] ppm: $rho")
    // d2 bounds: 0 (identical rankings) .. n(n^2-1)/3 (reversed)
    assert(d2 >= 0 && d2 <= n * (n * n - 1) / 3)
    // price and customer order-count are engineered independent-ish:
    // |rho| should be small, not degenerate at the bounds
    assert(math.abs(rho) < 500000, s"suspiciously strong correlation: $rho")
  }

  test("source_text_gzip: the codec path is lossless across shards") {
    val rows = SparkEntry.queries("source_text_gzip")(spark, sf).collect()
    val n = Tables.orders(spark, sf).where(col("o_orderkey") % 7 === 0).count()
    assert(rows.map(_.getLong(1)).sum == n, "every line survives decompression")
    val dir = new java.io.File(graft.ops.Scratch.opDir("textgz", sf))
    assert(dir.listFiles.count(_.getName.endsWith(".gz")) == 3,
      "three shards staged for parallelism")
  }
}
