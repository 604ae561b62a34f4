package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic checks for the round-10 wave-24 ops beyond the oracle gate. */
class Round10Wave24Spec extends AnyFunSuite with SparkFixture {

  test("llm_fim_transform: spans tile the document, markers conserve") {
    val rows = SparkEntry.queries("llm_fim_transform")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (len, c1, c2) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(0 <= c1 && c1 <= c2 && c2 <= len, s"cuts must nest inside the doc: $r")
      assert(r.getBoolean(5), s"marker-adjusted length must conserve: $r")
    }
  }

  test("llm_prefix_cache_plan: accounting ties out and savings are bounded") {
    val r = SparkEntry.queries("llm_prefix_cache_plan")(spark, sf).collect().head
    val (prompts, groups, shared, saved, total) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    assert(prompts == Tables.documents(spark, sf).count())
    assert(groups <= prompts && shared <= groups)
    assert(saved == (prompts - groups) * 16, "hits = prompts - groups, 16 chars each")
    assert(r.getLong(5) <= 1000000 && saved <= total)
  }
}
