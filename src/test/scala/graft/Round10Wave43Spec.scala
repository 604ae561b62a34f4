package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic checks for the round-10 wave-43 ops beyond the oracle gate. */
class Round10Wave43Spec extends AnyFunSuite with SparkFixture {

  test("source_fixed_width: offset slicing reproduces the relational rollup") {
    val rows = SparkEntry.queries("source_fixed_width")(spark, sf).collect()
    assert(rows.nonEmpty)
    val viaParquet = Tables.orders(spark, sf)
      .where(org.apache.spark.sql.functions.expr("o_orderkey % 11 = 0")).count()
    assert(rows.map(_.getLong(1)).sum == viaParquet,
      "every staged record survives the fixed-width roundtrip")
    rows.foreach { r =>
      assert(r.getString(0).length == 1, "status is the single char at offset 13")
      assert(r.getLong(2) > 0, "cents parsed, not zero-shifted")
    }
  }

  test("fn_allen_intervals: the cascade partitions all pairs; dense relations dominate") {
    val rows = SparkEntry.queries("fn_allen_intervals")(spark, sf).collect()
    val byRel = rows.map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = byRel.values.sum
    assert(total == Tables.events(spark, sf).count(), "every pair classifies exactly once")
    // intervals of length <=100 over a 1000 span: disjoint relations dominate
    val disjoint = byRel.getOrElse("precedes", 0L) + byRel.getOrElse("preceded_by", 0L)
    assert(disjoint * 2 > total, s"mostly disjoint by construction: $disjoint/$total")
    // zero-measure relations (exact endpoint equality) are rare but the
    // cascade must never produce an unknown label
    val known = Set("precedes", "meets", "preceded_by", "met_by", "equals", "starts",
      "started_by", "finishes", "finished_by", "during", "contains", "overlaps", "overlapped_by")
    assert(byRel.keySet.subsetOf(known))
  }

  test("agg_mk_trend: n recovered exactly from the triangular pair count") {
    val r = SparkEntry.queries("agg_mk_trend")(spark, sf).collect().head
    val (n, nPairs, sStat) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(n * (n - 1) / 2 == nPairs, "triangular-number inversion is exact")
    assert(math.abs(sStat) <= nPairs, "S bounded by the pair count")
    assert(r.getLong(3) == n * (n - 1) * (2 * n + 5), "closed-form variance numerator")
    // stationary uniform noise: no significant monotone drift
    assert(!r.getBoolean(4), "no planted trend, no flag")
  }
}
