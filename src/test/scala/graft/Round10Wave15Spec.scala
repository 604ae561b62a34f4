package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic checks for the round-10 wave-15 ops beyond the oracle gate. */
class Round10Wave15Spec extends AnyFunSuite with SparkFixture {

  test("source_delta_read: removed file never served, versions resolve") {
    val root = graft.ops.DeltaRead.ensureTable(spark, sf)
    val v0 = graft.ops.DeltaRead.liveFiles(root, Some(0L))
    val v1 = graft.ops.DeltaRead.liveFiles(root, Some(1L))
    assert(v0.exists(_.endsWith("A.parquet")) && v0.exists(_.endsWith("B.parquet")))
    assert(v1.exists(_.endsWith("A.parquet")) && v1.exists(_.endsWith("C.parquet")))
    assert(!v1.exists(_.endsWith("B.parquet")), "removed file served at head")
    // rows conserve per version against the mod-class build rule
    val rows = SparkEntry.queries("source_delta_read")(spark, sf).collect()
    val n = Tables.orders(spark, sf).count()
    Seq(0L, 1L).foreach { v =>
      val served = rows.filter(_.getLong(0) == v).map(_.getLong(2)).sum
      assert(math.abs(served - n * 2 / 3) <= 2, s"version $v row count off: $served")
    }
  }

  test("agg_benjamini_hochberg: step-up cutoff separates rejections exactly") {
    val rows = SparkEntry.queries("agg_benjamini_hochberg")(spark, sf).collect()
    assert(rows.length == 20)
    val kStar = rows.head.getLong(4)
    assert(rows.forall(_.getLong(4) == kStar), "cutoff must be global")
    rows.foreach { r =>
      assert(r.getBoolean(5) == (r.getLong(2) <= kStar), "rejection rule broken")
    }
    // everything below the cutoff rejects even if its own step fails
    // (the step-UP property); everything above never rejects
    val atCut = rows.find(_.getLong(2) == kStar)
    atCut.foreach(r => assert(r.getBoolean(3), "k* itself must satisfy the step"))
  }

  test("llm_tool_trace_audit: the JSON roundtrip conserves calls") {
    val rows = SparkEntry.queries("llm_tool_trace_audit")(spark, sf).collect()
    assert(rows.map(_.getString(0)).toSet == Set("code", "fetch", "search"))
    val nDocs = Tables.documents(spark, sf)
      .where(org.apache.spark.sql.functions.col("doc_id") % 15 === 0).count()
    assert(rows.map(_.getLong(1)).sum == nDocs * 3, "3 calls per trace")
    rows.foreach(r => assert(r.getLong(2) <= r.getLong(1)))
  }
}
