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

  test("llm_bpe_encode: token totals tie out to the merge loop's final corpus size") {
    val enc = SparkEntry.queries("llm_bpe_encode")(spark, sf).collect()
    assert(enc.nonEmpty)
    // compression: merges only ever shrink words, and every 1-char word
    // stays 1 token, so tokens <= chars with strict gain somewhere
    val totToks = enc.map(_.getLong(4)).sum
    val totChars = enc.map(_.getLong(3)).sum
    assert(totToks <= totChars && totToks > 0)
    assert(totToks < totChars, "5 merge rounds must compress the corpus")
    // exact cross-op invariant: encoding the corpus with the learned
    // merges must account for EXACTLY the final n_syms the training loop
    // reported (same vocab, same corpus weights)
    val lastNSyms = SparkEntry.queries("llm_bpe_merge")(spark, sf)
      .orderBy(col("round").desc).limit(1).collect()(0).getLong(4)
    assert(totToks == lastNSyms,
      s"encode totals $totToks != training's final corpus symbols $lastNSyms")
  }

  test("llm_quality_classifier: non-degenerate split, keep_rate consistent") {
    val rows = SparkEntry.queries("llm_quality_classifier")(spark, sf).collect()
    val (docs, keeps) = (rows.map(_.getLong(1)).sum, rows.map(_.getLong(2)).sum)
    assert(keeps > 0 && keeps < docs,
      s"classifier must split the corpus, kept $keeps of $docs")
    rows.foreach { r =>
      val rate = r.getDouble(3)
      assert(rate >= 0.0 && rate <= 1.0)
      assert(math.abs(rate - r.getLong(2).toDouble / r.getLong(1)) < 1e-3)
    }
  }

  test("llm_data_mixture: epoch cap holds and reweighting points toward the target") {
    val rows = SparkEntry.queries("llm_data_mixture")(spark, sf).collect()
    val byLang = rows.map(r => r.getString(0) -> r).toMap
    rows.foreach { r =>
      val (toks, epochs, eff) = (r.getLong(2), r.getDouble(5), r.getLong(6))
      assert(epochs > 0.0 && epochs <= 3.0)
      assert(eff <= (3.0 * toks).toLong && math.abs(eff - epochs * toks) <= 1)
    }
    // 'en' dominates the corpus (actual ~0.55 > target 0.30) so it is
    // DOWN-sampled; the minority languages are up-sampled
    assert(byLang("en").getDouble(5) < 1.0)
    assert(byLang("de").getDouble(5) > 1.0)
  }

  test("agg_cms_freq: the sketch never underestimates and stays within the epsilon bound") {
    val rows = SparkEntry.queries("agg_cms_freq")(spark, sf).collect()
    assert(rows.length == 20)
    val n = Tables.orders(spark, sf).count()
    rows.foreach { r =>
      val (exact, est) = (r.getLong(1), r.getLong(2))
      assert(r.getBoolean(3) && est >= exact, s"CMS underestimated: $est < $exact")
      // Markov bound with d=4 rows, w=64 buckets: overshoot <= e/w * N holds
      // with prob 1-e^-4 per key; 4x that slack cannot flake on a fixed
      // dataset + fixed hash (it is deterministic here, this is a sanity rail)
      assert(est - exact <= 4 * math.E / 64 * n,
        s"CMS overshoot ${est - exact} implausibly large for N=$n")
    }
  }
}
