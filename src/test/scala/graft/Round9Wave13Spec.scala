package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic checks for the round-9 wave-13 operators beyond the oracle
  * gate: ANN recall floor, bootstrap replica statistics, and PERMISSIVE
  * JSON partial-result semantics.
  */
class Round9Wave13Spec extends AnyFunSuite with SparkFixture {

  test("llm_ann_recall: every probe reported with 5 exact neighbors; aggregate recall decent") {
    val rows = SparkEntry.queries("llm_ann_recall")(spark, sf).collect()
    assert(rows.length == 10, "ten probes (vec_id < 10)")
    rows.foreach { r =>
      assert(r.getLong(1) == 5L, s"exact top-k must be 5: $r")
      assert(r.getLong(2) >= 0 && r.getLong(2) <= 5, s"hits out of range: $r")
      assert(r.getLong(3) == r.getLong(2) * 1000000L / 5, s"recall ppm mislabeled: $r")
    }
    // the IVF index must decisively beat random guessing (random recall
    // = 5/(n−1) ≈ 1–5% at fixture scale; observed ~34–48%)
    val nVec = Tables.embeddings(spark, sf).count().toDouble
    val randomRecall = 5.0 / (nVec - 1.0)
    val mean = rows.map(_.getLong(2)).sum.toDouble / (5.0 * rows.length)
    assert(mean >= math.max(0.15, 3 * randomRecall),
      s"ANN recall collapsed to $mean (random would be $randomRecall) — index broken")
  }

  test("agg_poisson_bootstrap: 20 replicas, n_eff ≈ n, replica means bracket the true mean") {
    val rows = SparkEntry.queries("agg_poisson_bootstrap")(spark, sf).collect()
    assert(rows.map(_.getLong(0)).sorted.toSeq == (0L to 19L))
    val n = Tables.orders(spark, sf).count()
    rows.foreach { r =>
      // Poisson(1) effective sample size concentrates near n
      assert(math.abs(r.getLong(1) - n) < n / 5, s"replica n_eff far from n: $r")
      assert(math.abs(r.getDouble(3) - r.getLong(2).toDouble / r.getLong(1)) < 1e-9)
    }
    val trueMean = Tables.orders(spark, sf)
      .select(sum(expr("CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 100 AS BIGINT)")))
      .collect()(0).getLong(0).toDouble / n
    val means = rows.map(_.getDouble(3))
    assert(means.min <= trueMean && trueMean <= means.max,
      "the bootstrap distribution must bracket the point estimate")
    // and the replica spread is small relative to the mean (CLT sanity)
    assert((means.max - means.min) / trueMean < 0.1)
  }

  test("source_json_badrecords: partial-result semantics pinned") {
    val rows = SparkEntry.queries("source_json_badrecords")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(rows("clean") == ((4L, 90L, 4L, 4L)))
    // type-mismatch row keeps id+name parsed (partial results); raw line keeps nothing
    assert(rows("corrupt") == ((2L, 0L, 1L, 1L)))
  }
}
