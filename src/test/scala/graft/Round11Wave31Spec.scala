package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic checks for round-11 wave 31: coreness, by-name union with
  * missing columns, bit-packing.
  */
class Round11Wave31Spec extends AnyFunSuite with SparkFixture {

  test("graph_coreness: consistent with the k=6 core and degree bounds") {
    val rows = SparkEntry.queries("graph_coreness")(spark, sf).collect()
    assert(rows.nonEmpty)
    val core = rows.map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the k=6 survivors of graph_kcore are exactly the coreness ≥ 6 nodes
    val k6 = SparkEntry.queries("graph_kcore")(spark, sf).collect()
      .map(_.getLong(0)).toSet
    assert(core.filter(_._2 >= 6).keySet == k6,
      "coreness ≥ 6 must equal the k=6 core membership")
    assert(core.values.forall(c => c >= 0 && c <= 24), "bounded by max degree")
    assert(core.values.exists(_ >= 1), "the backbone has a non-trivial core")
  }

  test("api_union_missing_cols: v1 rows carry NULL cents, v2 rows carry values") {
    val rows = SparkEntry.queries("api_union_missing_cols")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val k = r.getLong(0)
      if (k % 200 == 1) assert(r.isNullAt(2), s"v1 row must be padded: $r")
      else assert(!r.isNullAt(2), s"v2 row must keep its column: $r")
    }
  }

  test("fn_bitpack_roundtrip: every sampled row reconstructs all 8 fields") {
    val rows = SparkEntry.queries("fn_bitpack_roundtrip")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(4), s"pack/unpack identity broke: $r")
      assert(r.getLong(1) >= 0, "byte 7 < 128 keeps the packed value positive")
    }
  }
}
