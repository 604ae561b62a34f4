package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic checks for the round-10 wave-37 ops beyond the oracle gate. */
class Round10Wave37Spec extends AnyFunSuite with SparkFixture {

  test("ds_typed_joinwith: segment rollup conserves the joined order count") {
    val rows = SparkEntry.queries("ds_typed_joinwith")(spark, sf).collect()
    assert(rows.length == 5, "five market segments")
    rows.foreach { r =>
      assert(r.getLong(1) > 0 && r.getLong(2) > 0, s"non-degenerate segment: $r")
    }
    val totalJoined = rows.map(_.getLong(1)).sum
    val orders = Tables.orders(spark, sf).count()
    assert(totalJoined == orders, "every order has exactly one customer")
  }

  test("ds_typed_flatmap_groups: fold's top-2 is order-independent and strictly ranked") {
    val rows = SparkEntry.queries("ds_typed_flatmap_groups")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (t1c, t1i, t2c, t2i) = (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      // strict lexicographic ranking on (cents, id)
      assert(t1c > t2c || (t1c == t2c && t1i > t2i), s"top-1 strictly beats top-2: $r")
      assert(t2c >= 0, "groups have at least two rows at every fixture scale")
    }
  }

  test("agg_cohens_d: planted +3000 shift yields a positive small-to-medium effect") {
    val r = SparkEntry.queries("agg_cohens_d")(spark, sf).collect().head
    val (n0, n1) = (r.getLong(0), r.getLong(1))
    assert(math.abs(n0 - n1) * 5 < n0 + n1, "md5 split is near-even")
    assert(r.getLong(5) == 1L, "direction must point at the treated arm")
    val d2 = r.getLong(4)
    // d = 3000/sigma with sigma ~ 14100 for uniform cents: d^2 ~ 45000 micro
    assert(d2 > 5000 && d2 < 500000, s"planted effect size in the expected band: $d2")
  }
}
