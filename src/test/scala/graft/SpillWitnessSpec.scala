package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.Tag
import org.scalatest.funsuite.AnyFunSuite

/** Tag for the once-per-round spill witness; EXCLUDED from the default
  * `sbt test` run (build.sbt filters it out — it needs its OWN
  * SparkSession with a constrained memory conf, which getOrCreate would
  * otherwise share with every other suite in the JVM). The global -l
  * exclusion in build.sbt beats a per-invocation -n include, so run it by
  * overriding the options for the session:
  *   set Test / testOptions := Seq(Tests.Argument(TestFrameworks.ScalaTest, "-n", "graft.SpillWitness"))
  *   testOnly graft.SpillWitnessSpec
  * (then `reload` to restore the default filters).
  */
object SpillWitness extends Tag("graft.SpillWitness")

/** Spill witness (VERDICT r13 "Next round" item 4): the 100 TB plan
  * assumes partitions that exceed executor memory DEGRADE to disk spill
  * instead of failing — this measures it. A hash aggregation over more
  * distinct keys than the constrained execution memory can hold must
  * (a) complete, (b) produce the exact answer, and (c) report non-zero
  * spill through the task-metrics listener — the same metrics surface a
  * production job would alarm on.
  */
class SpillWitnessSpec extends AnyFunSuite {

  test("hash aggregation under constrained memory completes exactly and spills",
    SpillWitness) {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-spill-witness")
      .config("spark.sql.shuffle.partitions", "2")
      // ~8% of (heap − 300 MB) shared execution+storage: each of the 2
      // aggregate tasks holds ~3M distinct 32-char keys (~300 MB of hash
      // table) against a few tens of MB of execution memory → the
      // HashAggregate must fall back to its sort-based spill path
      .config("spark.memory.fraction", "0.08")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      s.sparkContext.setLogLevel("WARN")
      @volatile var spilledBytes = 0L
      s.sparkContext.addSparkListener(new SparkListener {
        override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
          val m = t.taskMetrics
          if (m != null)
            spilledBytes += m.memoryBytesSpilled + m.diskBytesSpilled
        }
      })
      // Heap-proportional key count (r14 ADVICE: the fixed 6M was
      // environment-sensitive — a roomy heap might not spill): per task
      // the hash table must exceed the 0.08-fraction execution share at
      // ANY heap, so size it off the actual -Xmx. 1600 keys/heap-MB →
      // ~2× the per-task execution memory in 32-char md5 keys. attest.sh
      // additionally pins SPARK_DRIVER_MEM=4g for stable wall-clock.
      val heapMb = Runtime.getRuntime.maxMemory() / (1024L * 1024L)
      val n = math.max(6000000L, heapMb * 1600L)
      info(s"heap ${heapMb}MB -> $n keys")
      val agg = s.range(0, n, 1, 16)
        .select(md5(concat(lit("spill:"), col("id").cast("string"))).as("k"))
        .groupBy("k").agg(count(lit(1)).as("c"))
        .agg(count(lit(1)).as("groups"), sum("c").as("total"))
        .head()
      // exactness under memory pressure: md5 keys are all distinct, so
      // the group count and the re-summed mass must both equal n
      assert(agg.getLong(0) == n, s"lost groups under spill: ${agg.getLong(0)}")
      assert(agg.getLong(1) == n, s"lost rows under spill: ${agg.getLong(1)}")
      // task-end events drain asynchronously on the listener bus
      val deadline = System.currentTimeMillis() + 15000
      while (spilledBytes == 0L && System.currentTimeMillis() < deadline)
        Thread.sleep(200)
      info(f"spilled bytes: $spilledBytes%,d")
      assert(spilledBytes > 0L,
        "expected non-zero memory/disk spill under spark.memory.fraction=0.08")
    } finally s.stop()
  }
}
