package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Diagnostic main: run one streaming fixture with a progress listener and
  * print the per-batch durationMs breakdown (queryPlanning, getBatch,
  * addBatch, walCommit, commitOffsets, stateStore metrics) — the profile
  * that decides where the streaming-fixture fixed tax actually lives.
  * Not part of the graded surface. */
object ProfileStream {
  def main(args: Array[String]): Unit = {
    val op = args.headOption.getOrElse("stream_stream_left")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    System.setProperty("derby.stream.error.file", s"${graft.ops.Scratch.dir}/derby.log")
    val b0 = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.streaming.checkpointLocation", graft.ops.Scratch.ckptDir)
    val spark = sys.env.get("GRAFT_CKPT_FM")
      .fold(b0)(c => b0.config("spark.sql.streaming.checkpointFileManagerClass", c))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val batches = scala.collection.mutable.ArrayBuffer.empty[String]
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit =
        batches += s"STARTED ${System.nanoTime() / 1000000}"
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        val dur = p.durationMs
        batches += s"batch=${p.batchId} rows=${p.numInputRows} dur=${dur}"
      }
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit =
        batches += s"TERM ${System.nanoTime() / 1000000}"
    })
    val stages = scala.collection.mutable.ArrayBuffer.empty[String]
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val i = sc.stageInfo
        val dur = for (a <- i.completionTime; b <- i.submissionTime) yield a - b
        stages += s"stage=${i.stageId} tasks=${i.numTasks} dur=${dur.getOrElse(-1L)}ms name=${i.name.take(60)}"
      }
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        stages += s"JOB ${j.jobId} t=${System.nanoTime() / 1000000}"
    })
    // warm-up identical to Bench
    spark.range(1000).selectExpr("sum(id)").collect()
    def once(): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(op)(spark, sfDir).count()
      (System.nanoTime() - t0) / 1e9
    }
    for (i <- 1 to 3) {
      batches.clear(); stages.clear()
      val t = once()
      Thread.sleep(300) // let async listener drain
      println(s"== run $i: ${"%.2f".format(t)}s")
      batches.foreach(b => println("   " + b))
      stages.foreach(b => println("   " + b))
    }
    spark.stop()
  }
}
