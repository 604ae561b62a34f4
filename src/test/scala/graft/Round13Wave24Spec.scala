package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Round-13 waves 24+ (Round13cOps): concurrent sessions, A/B exposure
  * integrity, context-growth planning.
  */
class Round13Wave24Spec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[8]")
      .appName("graft-r13w24")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  private val sf = "/root/testdata/sf0.001"

  test("service_concurrent_sessions: sweep conserves sessions, overlaps bound") {
    val rows = SparkEntry.queries("service_concurrent_sessions")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getLong(1)).sum == Tables.events(spark, sf).count())
    rows.foreach { r =>
      val (sessions, peak, overlaps, ppm) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(peak >= 1, "at least one session is always live at its own start")
      assert(overlaps < sessions, "not every session can overlap-start")
      assert(ppm == overlaps * 1000000L / sessions)
      if (peak >= 2) assert(overlaps >= 1)
    }
  }

  test("service_ab_exposure_integrity: the override plants contamination") {
    val rows = SparkEntry.queries("service_ab_exposure_integrity")(spark, sf)
      .collect()
    assert(rows.length == 3)
    assert(rows.map(_.getLong(3)).sum == Tables.events(spark, sf).count())
    rows.foreach { r =>
      val (users, contaminated, ppm) =
        (r.getLong(1), r.getLong(2), r.getLong(4))
      assert(contaminated <= users)
      assert(ppm == contaminated * 1000000L / users)
    }
    assert(rows.map(_.getLong(2)).sum >= 1,
      "every-97th-event override must contaminate someone")
  }

  test("llm_context_growth_plan: cumulative tokens overflow exactly once per run") {
    val rows = SparkEntry.queries("llm_context_growth_plan")(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getLong(1)).sum == Tables.events(spark, sf).count())
    rows.foreach { r =>
      val (turns, mass, overflowTurns, ppm) =
        (r.getLong(1), r.getLong(2), r.getLong(4), r.getLong(5))
      assert(mass >= turns * 10, "every turn costs at least the 10-token floor")
      if (!r.isNullAt(3)) {
        val first = r.getInt(3)
        assert(first >= 1 && overflowTurns >= 1)
        assert(overflowTurns <= turns - first + 1,
          s"overflow turns bounded by the tail after first overflow: $r")
      } else assert(overflowTurns == 0)
      assert(ppm == overflowTurns * 1000000L / turns)
    }
  }
}
