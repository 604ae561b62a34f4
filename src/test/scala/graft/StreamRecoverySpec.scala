package graft

import java.sql.Timestamp
import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{RunningStatsProcessor, SEvent}

/** Streaming crash-recovery witness (VERDICT r9 #6): a transformWithState
  * query over the RocksDB state store is stopped MID-STREAM — with an
  * undrained batch pending, so the stop races the micro-batch exactly the
  * way a crash does — and restarted from its checkpoint. The witness
  * asserts the two recovery contracts:
  *   - operator STATE survives: the post-restart emission continues the
  *     per-key running totals from before the stop;
  *   - output is EXACTLY-ONCE: the file sink's commit log makes the final
  *     parquet contents identical whether the pending batch committed
  *     before the stop or was replayed after it — each cumulative row
  *     appears exactly once.
  */
class StreamRecoverySpec extends AnyFunSuite with SparkFixture {

  test("transformWithState (RocksDB) restarts from checkpoint: state survives, sink exactly-once") {
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      import classic.implicits._
      implicit val sq = classic.sqlContext
      val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[SEvent]
      val out = s"${graft.ops.Scratch.dir}/recovery_out"
      val cp = s"${graft.ops.Scratch.dir}/recovery_cp"
      def start() = ms.toDS()
        .groupByKey(_.user_id)
        .transformWithState(new RunningStatsProcessor, TimeMode.None(), OutputMode.Append())
        .toDF("user_id", "n_events", "total_value")
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", cp)
        .outputMode("append").start()

      val q1 = start()
      ms.addData(
        SEvent(1, Timestamp.valueOf("2024-01-01 10:00:00"), 1, "view", 2.0),
        SEvent(2, Timestamp.valueOf("2024-01-01 10:01:00"), 1, "click", 3.0),
        SEvent(3, Timestamp.valueOf("2024-01-01 10:02:00"), 2, "view", 5.0))
      q1.processAllAvailable() // batch A committed: (1,2,5.0), (2,1,5.0)
      // the crash: a batch is PENDING (no drain) when the query dies —
      // whether it committed before the stop is a genuine race, and the
      // assertions below must hold on both sides of it
      ms.addData(SEvent(4, Timestamp.valueOf("2024-01-01 10:03:00"), 1, "view", 10.0))
      q1.stop()

      val q2 = start() // same checkpoint: offsets + RocksDB state restored
      q2.processAllAvailable() // (re)plays the pending batch exactly once
      // state witness: one more u1 event must continue from (3, 15.0)
      ms.addData(SEvent(5, Timestamp.valueOf("2024-01-01 10:04:00"), 1, "view", 1.0))
      q2.processAllAvailable()
      q2.stop()

      val rows = spark.read.parquet(out)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      val expected = Seq(
        (1L, 2L, 5.0), (2L, 1L, 5.0), // batch A
        (1L, 3L, 15.0),               // the crashed-over batch, exactly once
        (1L, 4L, 16.0))               // post-restart: state continued
      assert(rows.sorted == expected.sorted,
        s"recovery output mismatch: got ${rows.sorted}")
    } finally {
      prev match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
  }
}
