package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, If, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.graftbridge.{AllPairsCosineStrategy, AsOfJoinStrategy, CosineSimilarity, CosineTopKStrategy, DotProduct}
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
    e.injectPlannerStrategy(_ => CosineTopKStrategy)
    e.injectPlannerStrategy(_ => AsOfJoinStrategy)
    e.injectPlannerStrategy(_ => AllPairsCosineStrategy)
    e.injectOptimizerRule(_ => SelfCosineIdentity)
  }
}

/** Domain optimizer rule: cosine of an expression with ITSELF is 1 by
  * definition — except the zero vector, where the engine's convention
  * (CosineSimilarity.scala) is 0. The rewrite keeps exactly that
  * semantics while dropping the similarity's 3n multiplications to the
  * n of a single self-dot-product zero test. Self-pairs slip into real
  * plans when a dedup self-join's `a < b` guard is relaxed to `a <= b`
  * or a probe set overlaps the corpus.
  */
object SelfCosineIdentity extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case CosineSimilarity(l, r) if l.deterministic && l.semanticEquals(r) =>
        If(org.apache.spark.sql.catalyst.expressions.EqualTo(
            DotProduct(l, l), Literal(0.0, DoubleType)),
          Literal(0.0, DoubleType), Literal(1.0, DoubleType))
    }
}
