package graft

import org.scalatest.funsuite.AnyFunSuite

/** §2.10 pure-streaming semantics (SURVEY §5.3): the three MemoryStream ops
  * run real Structured Streaming queries; assert watermark late-drop,
  * stateful dedup, and custom state-machine outputs exactly.
  */
class StreamingSpec extends AnyFunSuite with SparkFixture {

  test("stream_watermark_late drops the late row and finalizes windows") {
    val rows = SparkEntry.queries("stream_watermark_late")(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    // Batch 1: 10:00,10:10 view + 10:50 click + 11:05 view. Batch 2 advances
    // the watermark to 12:50 → hour-10 and hour-11 windows close; the
    // re-sent 10:05 view is late and must NOT appear in any count.
    assert(rows.contains(("2024-01-01 10:00:00", "view", 2L)),
      s"late row leaked or window wrong: ${rows.mkString(", ")}")
    assert(rows.contains(("2024-01-01 10:00:00", "click", 1L)))
    assert(rows.contains(("2024-01-01 11:00:00", "view", 1L)))
    // the 13:00 click window is still open (watermark == 12:50) → not emitted
    assert(!rows.exists(_._1 == "2024-01-01 13:00:00"))
  }

  test("stream_dedup_stateful drops the re-sent event_id") {
    val ids = SparkEntry.queries("stream_dedup_stateful")(spark, sf)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(ids == Seq(1L, 2L, 3L, 4L))
  }

  test("stream_stateful_custom accumulates per-user state across batches") {
    val rows = SparkEntry.queries("stream_stateful_custom")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // batch 1: user 1 -> (2, 5.0), user 2 -> (1, 5.0)
    // batch 2: user 1 -> (3, 15.0)  (state carried over)
    assert(rows == Set((1L, 2L, 5.0), (2L, 1L, 5.0), (1L, 3L, 15.0)))
  }

  test("batch session_window splits at >30-minute gaps") {
    import org.apache.spark.sql.functions._
    val df = SparkEntry.queries("stream_session")(spark, sf)
    // every session's span (end-gap to start) is consistent: end >= start
    val bad = df.where(col("s_end") <= col("s_start")).count()
    assert(bad == 0)
    // sessions per user never overlap: starts are strictly increasing
    val u0 = df.where(col("user_id") === 0).collect().map(_.getString(1)).toSeq
    assert(u0 == u0.sorted && u0.distinct == u0)
  }

  // The graded stream_stateful_custom runs Spark 4's transformWithState
  // (StatefulProcessor + typed ValueState over the RocksDB state store).
  // The pre-4.x flatMapGroupsWithState formulation of the SAME per-user
  // running (count, sum) machine must emit identical rows — the cross-API
  // equivalence that lets a 3.x pipeline migrate without a semantic diff.
  test("flatMapGroupsWithState (legacy API) matches the graded transformWithState op") {
    val tws = SparkEntry.queries("stream_stateful_custom")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val legacy = graft.ops.StreamingOps.statefulCustomLegacy(spark)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(tws == legacy && tws == Set((1L, 2L, 5.0), (2L, 1L, 5.0), (1L, 3L, 15.0)))
  }

  test("stream_stateful_custom runs on the RocksDB state store provider") {
    // the op pins the provider for the query's lifetime and restores after;
    // prove the restore AND that the query really ran on RocksDB (the
    // provider is read at query start - a wrong conf key would silently
    // fall back to the HDFS-backed store)
    val key = "spark.sql.streaming.stateStore.providerClass"
    val before = spark.conf.getOption(key)
    val rows = SparkEntry.queries("stream_stateful_custom")(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(spark.conf.getOption(key) == before, "provider conf leaked")
    // RocksDB provider loads its JNI-backed store eagerly; reaching here
    // without a query-start error IS the evidence (transformWithState
    // REFUSES to run on the default HDFS provider in Spark 4.1).
  }
}
