package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-13 wave 3: ACID minor compaction + aborted-txn visibility,
  * admission quota, speculative-decoding plan. */
class Round13Wave3Spec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[8]")
      .appName("graft-r13w3")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  private val sf = "/root/testdata/sf0.001"

  test("sink_hive_acid_minor_compact: merged span replaces the originals, deletes still hit") {
    val got = SparkEntry.queries("sink_hive_acid_minor_compact")(spark, sf)
      .orderBy("o_orderstatus").collect()
    val want = graft.Tables.orders(spark, sf)
      .where(!(col("o_orderkey") % 14 === 1))
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n_orders"),
        sum(expr("CAST(FLOOR(o_totalprice * 100) AS BIGINT)")).as("cents"))
      .orderBy("o_orderstatus").collect()
    assert(got.map(_.toString).toSeq == want.map(_.toString).toSeq)
    // directory census: the merged span exists, the originals are gone
    val root = java.nio.file.Paths.get(graft.ops.Scratch.opDir("hive_acid_mc", sf))
    assert(java.nio.file.Files.exists(root.resolve("delta_0000002_0000003")))
    assert(!java.nio.file.Files.exists(root.resolve("delta_0000002_0000002")))
    assert(!java.nio.file.Files.exists(root.resolve("delta_0000003_0000003")))
  }

  test("source_hive_acid_aborted: aborted delta invisible, committed delete applies") {
    val got = SparkEntry.queries("source_hive_acid_aborted")(spark, sf)
      .orderBy("o_orderstatus").collect()
    val want = graft.Tables.orders(spark, sf)
      .where(!(col("o_orderkey") % 12 === 5))
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n_orders"),
        sum(expr("CAST(FLOOR(o_totalprice * 100) AS BIGINT)")).as("cents"))
      .orderBy("o_orderstatus").collect()
    assert(got.map(_.toString).toSeq == want.map(_.toString).toSeq)
    // the poison check: if the aborted delta leaked, evens would double
    val n = graft.Tables.orders(spark, sf).count()
    assert(got.map(_.getLong(1)).sum < n + 1)
  }

  test("service_admission_quota: rejections are exactly the over-quota tail") {
    val rows = SparkEntry.queries("service_admission_quota")(spark, sf).collect()
    assert(rows.length == 8)
    rows.foreach { r =>
      val (p, n, adm, rej) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(adm + rej == n, s"census mismatch: $r")
      assert(r.getLong(4) == rej * 1000000L / n)
      // a principal can never admit more than quota × observed hours
      val hours = graft.Tables.events(spark, sf)
        .where(col("user_id") % 8 === p)
        .select(expr("ts_us DIV 3600000000")).distinct().count()
      assert(adm <= (p * 5 + 30) * hours)
    }
  }

  test("llm_speculative_plan: acceptance series bounded, speedup in (1x, 5x]") {
    val rows = SparkEntry.queries("llm_speculative_plan")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (a, e, steps, speed) =
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(a >= 550000L && a < 950000L)
      // E = Σ a^i for i=1..4 < a/(1-a); and E ≥ a
      assert(e >= a && e < 4000000L)
      assert(speed > 1000000L && speed <= 5000000L, s"speedup out of band: $r")
      assert(steps >= 1L)
    }
  }
}
