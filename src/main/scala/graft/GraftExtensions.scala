package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, If, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.graftbridge.{AllPairsCosineStrategy, AsOfJoinStrategy, CosineSimilarity, CosineTopKStrategy, DotProduct, IntSqrt}
import org.apache.spark.sql.types.DoubleType

/** Config-driven deployment entry point: a cluster sets
  * `spark.sql.extensions=graft.GraftExtensions` and every session gets the
  * native functions, the whole-operator strategies, and the domain
  * optimizer rule at build time — no imperative registration calls.
  * (`GraftBridge` remains the post-hoc path for sessions the harness
  * already constructed; both routes install the same objects, and the
  * strategy/function registrations are idempotent.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (exprs: Seq[Expression]) => CosineSimilarity(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (exprs: Seq[Expression]) => DotProduct(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("isqrt"),
      new ExpressionInfo(classOf[IntSqrt].getName, "isqrt"),
      (exprs: Seq[Expression]) => IntSqrt(exprs(0))))
    e.injectPlannerStrategy(_ => CosineTopKStrategy)
    e.injectPlannerStrategy(_ => AsOfJoinStrategy)
    e.injectPlannerStrategy(_ => AllPairsCosineStrategy)
    e.injectOptimizerRule(_ => SelfCosineIdentity)
  }
}

/** Domain optimizer rule: cosine of an expression with ITSELF is rewritten
  * from the 3n-multiplication similarity to d/d over a single
  * self-dot-product d = dot(x, x) — n multiplications, and every edge
  * case falls out of the division itself: NULL input → d NULL → NULL
  * result; a NaN/±Inf element → d NaN/Inf → NaN (matching the full
  * expression's Inf/Inf); zero vector → guarded to the engine's 0.0
  * convention (CosineSimilarity.scala). For finite nonzero vectors the
  * result is the exact mathematical 1.0 (the unrewritten float
  * computation can land 1 ulp off 1.0 — the rewrite is the MORE accurate
  * value, documented as intentional canonicalization). Self-pairs slip
  * into real plans when a dedup self-join's `a < b` guard is relaxed to
  * `a <= b` or a probe set overlaps the corpus.
  */
object SelfCosineIdentity extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case CosineSimilarity(l, r) if l.deterministic && l.semanticEquals(r) =>
        val d = DotProduct(l, l)
        If(org.apache.spark.sql.catalyst.expressions.EqualTo(
            d, Literal(0.0, DoubleType)),
          Literal(0.0, DoubleType),
          org.apache.spark.sql.catalyst.expressions.Divide(d, d))
    }
}
