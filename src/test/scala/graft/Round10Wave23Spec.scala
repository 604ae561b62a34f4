package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic checks for the round-10 wave-23 ops beyond the oracle gate. */
class Round10Wave23Spec extends AnyFunSuite with SparkFixture {

  test("agg_cohens_kappa: planted 3/4 copy rate lands kappa where theory says") {
    val r = SparkEntry.queries("agg_cohens_kappa")(spark, sf).collect().head
    val (n, agree, kappa) = (r.getLong(0), r.getLong(1), r.getLong(3))
    // agreement ~ 3/4 + 1/4*1/3 = 5/6; kappa ~ (5/6 - 1/3)/(1 - 1/3) = 0.75
    assert(agree.toDouble / n > 0.8 && agree.toDouble / n < 0.88)
    assert(kappa > 650000 && kappa < 850000, s"kappa far from the planted 0.75: $kappa")
  }

  test("graph_greedy_matching: a true matching (no node twice), locally minimal") {
    val rows = SparkEntry.queries("graph_greedy_matching")(spark, sf).collect()
    assert(rows.nonEmpty)
    val nodes = rows.flatMap(r => Seq(r.getLong(0), r.getLong(1)))
    assert(nodes.distinct.length == nodes.length, "a node was matched twice")
    rows.foreach(r => assert(r.getLong(0) < r.getLong(1), "canonical edge order"))
    assert(rows.map(_.getLong(2)).max <= 4)
  }

  test("source_wholetext: every staged file returns as exactly one intact row") {
    val rows = SparkEntry.queries("source_wholetext")(spark, sf).collect()
    val src = Tables.documents(spark, sf).where(col("doc_id") % 75 === 0)
      .select(col("doc_id"), md5(col("text")).as("h")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows.length == src.size, "one row per file")
    rows.foreach(r => assert(r.getString(2) == src(r.getLong(0)),
      s"file content altered in flight: ${r.getLong(0)}"))
  }
}
