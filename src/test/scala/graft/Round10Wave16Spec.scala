package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic checks for the round-10 wave-16 ops beyond the oracle gate. */
class Round10Wave16Spec extends AnyFunSuite with SparkFixture {

  test("sink_delta_append: writer and reader agree on the protocol; replay is a no-op") {
    val rows = SparkEntry.queries("sink_delta_append")(spark, sf).collect()
    assert(rows.map(_.getLong(1)).sum == 4, "four events across two batches")
    // the log must hold exactly metadata + two data commits
    val root = graft.ops.Scratch.opDir("delta_sink", sf)
    val commits = new java.io.File(s"$root/_delta_log").listFiles
      .filter(_.getName.endsWith(".json")).map(_.getName).sorted
    assert(commits.length == 3, s"expected 3 commits, got ${commits.toSeq}")
    // exactly-once: re-running the op must not mint new commits or rows
    val again = SparkEntry.queries("sink_delta_append")(spark, sf).collect()
    assert(again.map(_.getLong(1)).sum == 4, "replay must be a no-op")
  }

  test("llm_length_bias_audit: counts partition the pairs; ppm over non-ties") {
    val r = SparkEntry.queries("llm_length_bias_audit")(spark, sf).collect().head
    val (n, longer, ties, ppm) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(longer + ties <= n)
    assert(ppm == longer * 1000000L / (n - ties), "ppm algebra")
    assert(r.getBoolean(4) == (ppm > 600000 || ppm < 400000), "verdict band")
  }

  test("fn_str_to_map: every order survives the kv parse") {
    val rows = SparkEntry.queries("fn_str_to_map")(spark, sf).collect()
    assert(rows.length == 5, "five okey%5 groups")
    assert(rows.map(_.getLong(1)).sum == Tables.orders(spark, sf).count())
    rows.foreach(r => assert(r.getLong(3) >= 1 && r.getLong(3) <= 5))
  }
}
