package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The config-driven deployment path: a session built with
  * `spark.sql.extensions=graft.GraftExtensions` gets the native functions,
  * the whole-operator strategies, and the SelfCosineIdentity optimizer
  * rule without any imperative registration.
  */
class GraftExtensionsSpec extends AnyFunSuite with SparkFixture {

  // a clean child session: it inherits the fixture's build-time extensions
  // but NONE of the imperative GraftBridge registrations other specs make
  // (newSession = fresh function registry + fresh experimental strategies),
  // so everything asserted below got there via spark.sql.extensions alone
  private lazy val ext: SparkSession = spark.newSession()

  test("injected functions resolve by name in SQL") {
    val r = ext.sql(
      "SELECT cosine_sim(array(1.0D, 2.0D), array(2.0D, 4.0D)) AS c, " +
        "dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d").collect()(0)
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(r.getDouble(1) == 11.0)
  }

  test("injected strategies are in the session planner") {
    val cls = ext.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val names = cls.sessionState.planner.strategies.map(_.toString)
    assert(names.exists(_.contains("CosineTopKStrategy")), names.mkString(","))
    assert(names.exists(_.contains("AsOfJoinStrategy")))
    assert(names.exists(_.contains("AllPairsCosineStrategy")))
  }

  test("SelfCosineIdentity folds cosine_sim(x, x) out of the plan") {
    val df = ext.sql(
      "SELECT cosine_sim(e, e) AS c FROM " +
        "(SELECT array(CAST(id AS DOUBLE), 1.0D) AS e FROM range(3))")
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("cosine_sim") && !optimized.contains("CosineSimilarity"),
      s"self-cosine not rewritten:\n$optimized")
    assert(df.collect().map(_.getDouble(0)).forall(_ == 1.0))
  }

  test("SelfCosineIdentity keeps the zero-vector convention (0, not 1)") {
    val r = ext.sql(
      "SELECT cosine_sim(array(0.0D, 0.0D), array(0.0D, 0.0D)) AS c").collect()(0)
    assert(r.getDouble(0) == 0.0)
  }

  test("SelfCosineIdentity preserves NULL and NaN propagation") {
    val r = ext.sql(
      "SELECT cosine_sim(e, e) AS c FROM (SELECT CAST(NULL AS ARRAY<DOUBLE>) AS e)")
      .collect()(0)
    assert(r.isNullAt(0), "NULL input must stay NULL after the rewrite")
    val n = ext.sql(
      "SELECT cosine_sim(array(CAST('NaN' AS DOUBLE), 1.0D), array(CAST('NaN' AS DOUBLE), 1.0D)) AS c")
      .collect()(0)
    assert(n.getDouble(0).isNaN, "NaN element must stay NaN after the rewrite")
  }

  test("SelfCosineIdentity leaves distinct arguments alone") {
    val df = ext.sql(
      "SELECT cosine_sim(array(1.0D, 0.0D), array(0.0D, 1.0D)) AS c")
    assert(df.collect()(0).getDouble(0) == 0.0)
  }
}
