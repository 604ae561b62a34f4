package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic checks for round-11 wave 21: Fleiss' kappa, Kendall's W,
  * Bland–Altman, recursive file lookup.
  */
class Round11Wave21Spec extends AnyFunSuite with SparkFixture {

  test("agg_fleiss_kappa: 80%-fidelity raters land substantial agreement") {
    val r = SparkEntry.queries("agg_fleiss_kappa")(spark, sf).collect().head
    assert(r.getBoolean(4), "planted consensus must be substantial (κ > 0.4)")
    // 3 raters, 80% faithful: κ ≈ 0.48 analytic band with slack
    assert(r.getLong(3) > 400000L && r.getLong(3) < 700000L, s"kappa: $r")
    // ΣT_c = 3N exactly (every item gets 3 ratings)
    assert(r.getLong(1) <= 6L * r.getLong(0), "pairs bounded by 3·2 per item")
  }

  test("agg_kendall_w: index-proportional skill drives concordance") {
    val r = SparkEntry.queries("agg_kendall_w")(spark, sf).collect().head
    assert(r.getLong(0) == 8 && r.getLong(1) == 4)
    assert(r.getBoolean(4), "planted common ordering must be concordant")
    // max ΣD² = m²(k³−k)/12 = 672 → W ≤ 1
    assert(r.getLong(2) <= 672, s"sum_d2 bound: $r")
    assert(r.getLong(3) > 700000L && r.getLong(3) <= 1000000L)
  }

  test("agg_bland_altman: planted bias recovered, heavy tail outside the limits") {
    val r = SparkEntry.queries("agg_bland_altman")(spark, sf).collect().head
    // bias = +20 ± noise mean (heavy tail shifts it slightly)
    assert(r.getLong(1) > 15000L && r.getLong(1) < 25000L, s"bias_milli: $r")
    // only heavy-tail draws can exceed 1.96σ of the mixture: 2–8%
    assert(r.getLong(3) > 20000L && r.getLong(3) < 80000L, s"outside_ppm: $r")
  }

  test("source_recursive_lookup: walks the tree, invents no partition column") {
    val df = SparkEntry.queries("source_recursive_lookup")(spark, sf)
    assert(df.collect().nonEmpty)
    // the pre-aggregation scan schema must be exactly the orders columns —
    // no y1995/y1996 dir-derived column may appear
    val scanCols = spark.read.option("recursiveFileLookup", "true")
      .parquet(graft.ops.Scratch.opDir("recdirs", sf)).columns.toSet
    assert(scanCols == Tables.orders(spark, sf).columns.toSet,
      s"no invented columns: $scanCols")
  }
}
