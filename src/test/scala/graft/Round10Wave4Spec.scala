package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic checks for `stream_bus_offsets` beyond the oracle gate: the
  * offset-tracked restart must RESUME, not replay — witnessed by batch-id
  * continuity across the two drains and per-partition offset contiguity.
  */
class Round10Wave4Spec extends AnyFunSuite with SparkFixture {

  test("stream_bus_offsets: exactly-once across the checkpointed restart") {
    val rows = SparkEntry.queries("stream_bus_offsets")(spark, sf).collect()
    assert(rows.length == 4, "one row per bus partition")
    // contiguity: a replayed segment breaks the count/sum, a dropped one
    // breaks max-vs-count — both fold into the graded boolean
    assert(rows.forall(_.getBoolean(5)), "offset contiguity violated")
    // conservation vs the batch source
    val n = Tables.events(spark, sf).where(col("event_id") % 5 === 0).count()
    assert(rows.map(_.getLong(1)).sum == n, "message count must survive the restart")
    // restart continuity: phase 2 landed NEW batch ids after the phase-1
    // ids (a from-scratch restart would re-land ids 0.. and double data)
    val land = new java.io.File(graft.ops.Scratch.opDir("bus_offsets", sf) + "/landed")
    val ids = land.listFiles.map(_.getName.stripPrefix("batch_").toLong).sorted
    assert(ids.length > 6, s"expected both phases' micro-batches, got ${ids.length}")
    assert(ids.distinct.length == ids.length && ids.last == ids.length - 1,
      "batch ids must be a gapless continuation across the restart")
  }
}
