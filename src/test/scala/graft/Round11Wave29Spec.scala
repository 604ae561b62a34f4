package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic checks for round-11 wave 29: JSON-schema validation,
  * Holm–Bonferroni, base36 roundtrip.
  */
class Round11Wave29Spec extends AnyFunSuite with SparkFixture {

  test("llm_json_schema_validate: the planted breakage classes partition") {
    import org.apache.spark.sql.functions._
    val r = SparkEntry.queries("llm_json_schema_validate")(spark, sf).collect().head
    val docs = Tables.documents(spark, sf)
    val n19 = docs.where(expr("doc_id % 19 = 0")).count()
    val n13 = docs.where(expr("doc_id % 13 = 0 AND doc_id % 19 <> 0")).count()
    val n17 = docs.where(expr(
      "doc_id % 17 = 0 AND doc_id % 19 <> 0 AND doc_id % 13 <> 0")).count()
    assert(r.getLong(1) == n19, s"malformed = truncated docs: ${r.getLong(1)} vs $n19")
    assert(r.getLong(2) == n13 + n17, "conf_bad = missing + string-typed")
    assert(r.getLong(0) == r.getLong(1) + r.getLong(2) + r.getLong(3),
      "classes partition the corpus")
  }

  test("agg_holm_bonferroni: step-down rejects a prefix, at least the planted effects") {
    val rows = SparkEntry.queries("agg_holm_bonferroni")(spark, sf).collect()
    assert(rows.length == 20)
    val byI = rows.sortBy(_.getLong(1))
    // holm_rejected must be a prefix property of the rank order
    val flags = byI.map(_.getBoolean(3))
    assert(!flags.dropWhile(identity).contains(true), "step-down is a prefix")
    // every planted effect (h<5, p<500ppm) passes even the harshest bar
    rows.filter(_.getLong(0) < 5).foreach(r =>
      assert(r.getBoolean(3), s"planted effect must be rejected: $r"))
    // Holm is uniformly at least as powerful as Bonferroni
    rows.foreach(r => assert(!r.getBoolean(4) || r.getBoolean(3),
      s"bonf ⊆ holm: $r"))
  }

  test("fn_base36_roundtrip: decode(encode(k)) == k on every sampled row") {
    val rows = SparkEntry.queries("fn_base36_roundtrip")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(3), s"roundtrip broke: $r")
      assert(r.getString(1).length == 7, "fixed-width codec")
      assert(r.getString(1).matches("[0-9a-z]{7}"))
    }
  }
}
