package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression

/** Thin bridge into Spark's session-local FunctionRegistry (private[sql]) so
  * graft can register native Catalyst expressions (e.g.
  * graft.functions.CosineSimilarity) on a session it did not build.
  *
  * The public alternative — SparkSessionExtensions.injectFunction — only
  * works when the extension is configured before the session is created; the
  * driver harness owns session construction (Verify.scala/Bench.scala), so a
  * post-hoc registration hook is required. This file deliberately lives under
  * org.apache.spark.sql to gain private[sql] access; it touches no internal
  * state other than the documented FunctionRegistry.
  */
object GraftBridge {
  def registerFunction(
      spark: SparkSession,
      name: String,
      builder: Seq[Expression] => Expression): Unit = {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    classic.sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "scala_udf")
  }
}
