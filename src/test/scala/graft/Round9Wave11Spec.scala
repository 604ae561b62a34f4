package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic checks for the round-9 wave-11 operators beyond the oracle
  * gate: point-in-time leakage freedom, TV-distance bounds, stopword
  * derivation tie-out, and diversity-ratio algebra.
  */
class Round9Wave11Spec extends AnyFunSuite with SparkFixture {

  test("join_point_in_time: no fact ever sees a future version (leakage-freedom law)") {
    val rows = SparkEntry.queries("join_point_in_time")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (sk, ver, first, last) = (r.getLong(0), r.getLong(1), r.getLong(4), r.getLong(5))
      assert(ver >= 0 && ver <= 2)
      val validFrom = 8000 + ver * 800 + sk % 97
      assert(first >= validFrom,
        s"supplier $sk version $ver used before its valid_from: $r")
      if (ver < 2) {
        val nextFrom = 8000 + (ver + 1) * 800 + sk % 97
        assert(last < nextFrom,
          s"supplier $sk version $ver used after version ${ver + 1} became valid: $r")
      }
      assert(first <= last && r.getLong(2) > 0)
      assert(r.getLong(6) == 100 + ver * 25)
    }
  }

  test("agg_tv_distance: TV in [0,1], five categories, exact pair consistency") {
    val rows = SparkEntry.queries("agg_tv_distance")(spark, sf).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getLong(0) == 5L, "TPC-H has five order priorities")
    val (n1, n2, num, den) = (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    assert(den == 2 * n1 * n2)
    assert(num >= 0 && num <= den, s"TV numerator out of range: $r")
    assert(math.abs(r.getDouble(5) - num.toDouble / den) < 1e-12)
  }

  test("llm_stopword_density: every doc reported; stop hits tie out to the top-5 tokens") {
    val sfDir = sf
    val rows = SparkEntry.queries("llm_stopword_density")(spark, sfDir).collect()
    assert(rows.length == Tables.documents(spark, sfDir).count())
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1), s"more stopwords than tokens: $r")
      assert(r.getLong(3) <= 1000000L)
      assert(r.getBoolean(4) == (r.getLong(3) > 400000L), s"verdict mislabeled: $r")
    }
    // recompute the data-derived list and its total occurrence count
    val toks = Tables.documents(spark, sfDir)
      .select(explode(split(col("text"), " ")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
    val top5 = toks.orderBy(desc("c"), col("w")).limit(5).collect()
    assert(rows.map(_.getLong(2)).sum == top5.map(_.getLong(1)).sum,
      "per-doc stop hits must conserve the top-5 corpus occurrences")
  }

  test("llm_ttr_diversity: ratio bounds and corpus conservation per language") {
    val sfDir = sf
    val rows = SparkEntry.queries("llm_ttr_diversity")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (toks, types, hapax) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(hapax <= types && types <= toks, s"diversity ordering violated: $r")
      assert(r.getLong(4) <= 1000000L && r.getLong(5) <= 1000000L)
    }
    val total = Tables.documents(spark, sfDir)
      .select(sum(size(split(col("text"), " ")))).collect()(0).getLong(0)
    assert(rows.map(_.getLong(1)).sum == total,
      "per-language token counts must conserve the corpus")
  }
}
