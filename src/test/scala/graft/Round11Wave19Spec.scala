package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic checks for round-11 wave 19: pinball loss, answer extraction,
  * DISTRIBUTE/SORT BY, initial-state streaming.
  */
class Round11Wave19Spec extends AnyFunSuite with SparkFixture {

  test("agg_pinball_loss: the true-p90 forecaster wins every type") {
    val rows = SparkEntry.queries("agg_pinball_loss")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(4), s"true quantile must win: $r")
      // E[10·L] ≈ 450/row for A, ≈ 1250/row for B on U[0,1000)
      val n = r.getLong(1)
      assert(r.getLong(2) < 700 * n && r.getLong(3) > 900 * n, s"loss bands: $r")
    }
  }

  test("llm_answer_extract_eval: distractors skipped, planted errors counted") {
    val r = SparkEntry.queries("llm_answer_extract_eval")(spark, sf).collect().head
    val (n, ext, correct) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(ext == n, "every synthetic answer has an extractable number")
    // exactly the ~10% planted wrong answers miss
    assert(correct < n && correct * 10 > n * 8, s"em band: $correct/$n")
    assert(r.getLong(3) + r.getLong(4) >= 999999L, "em + wrong partition")
  }

  test("api_sql_cluster_by: plan distributes on bucket and sorts locally") {
    val df = SparkEntry.queries("api_sql_cluster_by")(spark, sf)
    val rows = df.collect()
    assert(rows.length == 16, "16 buckets")
    assert(rows.map(_.getLong(0)).toSeq == (0L to 15L))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("hashpartitioning(bucket"), "DISTRIBUTE BY must shuffle on the bucket")
    assert(plan.contains("Sort [bucket") && !plan.contains("Sort [bucket#"
      + "GLOBAL"), "SORT BY is a local sort")
  }

  test("stream_initial_state: seeded keys continue, cold keys start fresh") {
    val rows = SparkEntry.queries("stream_initial_state")(spark, sf).collect()
    assert(rows.length == 3)
    val byUser = rows.map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(byUser(1L) == (6L, 1200L), "u1 continues its (5, 1000) warehouse seed")
    assert(byUser(2L) == (1L, 300L), "u2 starts cold")
    assert(byUser(3L) == (3L, 400L), "u3 continues its (2, 300) seed")
  }
}
