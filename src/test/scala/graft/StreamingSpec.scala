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

  // Spark 4's transformWithState (StatefulProcessor + typed ValueState, the
  // successor to flatMapGroupsWithState) — same per-user running (count,
  // sum) machine as stream_stateful_custom, must emit the same rows.
  // transformWithState requires the RocksDB state store provider.
  test("transformWithState (Spark 4 arbitrary-state API) matches flatMapGroupsWithState") {
    import java.sql.Timestamp
    import graft.ops.SEvent
    import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode}
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    import classic.implicits._
    implicit val sq = classic.sqlContext
    val prevProvider = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    try {
      val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[SEvent]
      val proc = new StatefulProcessor[Long, SEvent, (Long, Long, Double)] {
        @transient private var st: org.apache.spark.sql.streaming.ValueState[(Long, Double)] = _
        override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
          st = getHandle.getValueState[(Long, Double)]("agg",
            org.apache.spark.sql.Encoders.product[(Long, Double)], TTLConfig.NONE)
        override def handleInputRows(user: Long, rows: Iterator[SEvent],
            tv: org.apache.spark.sql.streaming.TimerValues): Iterator[(Long, Long, Double)] = {
          val (n0, v0) = if (st.exists()) st.get() else (0L, 0.0)
          var n = n0; var v = v0
          rows.foreach { e => n += 1; v += e.value }
          st.update((n, v))
          Iterator((user, n, v))
        }
      }
      val sink = "graft_tws_" + java.util.UUID.randomUUID().toString.replace("-", "")
      val q = ms.toDS().groupByKey(_.user_id)
        .transformWithState(proc, TimeMode.None(), OutputMode.Append())
        .toDF("user_id", "n_events", "total_value")
        .writeStream.format("memory").queryName(sink).outputMode("append").start()
      ms.addData(
        SEvent(1, Timestamp.valueOf("2024-01-01 10:00:00"), 1, "view", 2.0),
        SEvent(2, Timestamp.valueOf("2024-01-01 10:01:00"), 1, "click", 3.0),
        SEvent(3, Timestamp.valueOf("2024-01-01 10:02:00"), 2, "view", 5.0))
      q.processAllAvailable()
      ms.addData(SEvent(4, Timestamp.valueOf("2024-01-01 10:03:00"), 1, "purchase", 10.0))
      q.processAllAvailable()
      q.stop()
      val rows = spark.table(sink).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(rows == Set((1L, 2L, 5.0), (2L, 1L, 5.0), (1L, 3L, 15.0)))
    } finally {
      prevProvider match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
      spark.conf.set("spark.sql.shuffle.partitions", prevParts)
    }
  }
}
