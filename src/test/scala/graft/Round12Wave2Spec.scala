package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic checks for round-12 wave 2 beyond the oracle gate: KS/Cliff's
  * laws against brute-force twins, the decontamination plant's recovery,
  * elasticity sign algebra, and vortex bounds.
  */
class Round12Wave2Spec extends AnyFunSuite with SparkFixture {

  test("agg_ks_test: D matches the brute-force ECDF sweep and stays in [0,1]") {
    val r = SparkEntry.queries("agg_ks_test")(spark, sf).collect()(0)
    val (n0, n1, dNum, dMilli) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(n0 > 0 && n1 > 0)
    assert(dMilli >= 0 && dMilli <= 1000)
    // brute-force twin on the same fixture
    val rows = Tables.orders(spark, sf).select(
        expr("CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 100 AS BIGINT)").as("cents"),
        (col("o_orderkey") % 2).cast("int").as("grp")).collect()
    val a = rows.filter(_.getInt(1) == 0).map(_.getLong(0)).sorted
    val b = rows.filter(_.getInt(1) == 1).map(_.getLong(0)).sorted
    val values = (a ++ b).distinct.sorted
    val brute = values.map { v =>
      math.abs(a.count(_ <= v).toLong * b.length - b.count(_ <= v).toLong * a.length)
    }.max
    assert(dNum == brute, s"two-level cumulative D $dNum != brute $brute")
  }

  test("agg_cliffs_delta: pair counts match the O(n^2) definition") {
    val r = SparkEntry.queries("agg_cliffs_delta")(spark, sf).collect()(0)
    val (nA, nB, gt, lt) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    val rows = Tables.events(spark, sf)
      .where(col("event_type").isin("view", "purchase"))
      .select(expr("CAST(FLOOR(value * 100) AS BIGINT)").as("c"), col("event_type"))
      .collect()
    val va = rows.filter(_.getString(1) == "view").map(_.getLong(0))
    val vb = rows.filter(_.getString(1) == "purchase").map(_.getLong(0))
    assert(nA == va.length && nB == vb.length)
    // quadratic reference is fine at sf0.001 fixture scale
    var g = 0L; var l = 0L
    for (x <- va; y <- vb) { if (x > y) g += 1 else if (x < y) l += 1 }
    assert(gt == g && lt == l, s"($gt,$lt) != brute ($g,$l)")
    assert(math.abs(r.getLong(4)) <= 1000)
  }

  test("llm_decontam_ngram: every planted excerpt slot is recovered") {
    val r = SparkEntry.queries("llm_decontam_ngram")(spark, sf).collect()(0)
    val (nTrain, nEval, nContam) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(nTrain > 0 && nEval > 0)
    // planted slots: eval doc_id ≡ 7 (mod 62) whose train neighbor has
    // ≥ 24 tokens — each contaminates exactly that neighbor
    val planted = Tables.documents(spark, sf)
      .where(col("doc_id") % 62 === 7)
      .join(Tables.documents(spark, sf)
          .select((col("doc_id") + 1).as("doc_id"),
            size(split(col("text"), " ")).as("prev_len")),
        Seq("doc_id"))
      .where(col("prev_len") >= 24)
      .count()
    assert(nContam >= planted,
      s"screen found $nContam contaminated but $planted excerpts were planted")
    assert(r.getLong(3) >= nContam) // ≥1 shared gram per contaminated doc
  }

  test("agg_arc_elasticity: sign flips with the demand direction") {
    val rows = SparkEntry.queries("agg_arc_elasticity")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (q1, q2, e) = (r.getLong(1), r.getLong(2), r.getLong(3))
      // same-direction quantity and revenue-per-unit moves yield the
      // algebraic sign the cross-multiplied form encodes; just pin the
      // well-defined cases: no movement in quantity → elasticity 0
      if (q1 == q2) assert(e == 0L, s"${r.getString(0)}: Δq=0 but e=$e")
    }
  }

  test("win_vortex: VI ratios are nonnegative and bounded by the frame") {
    val rows = SparkEntry.queries("win_vortex")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (vp, vm) = (r.getLong(2), r.getLong(3))
      assert(vp >= 0 && vm >= 0)
      // |high_t − low_{t−1}| ≤ 2·TR-ish bound: VM sums never exceed
      // twice the TR sum (TR ≥ half of each movement by construction)
      assert(vp <= 2000 && vm <= 2000, s"VI out of band: $vp / $vm")
      assert(r.getBoolean(4) == (vp > vm))
    }
  }
}
