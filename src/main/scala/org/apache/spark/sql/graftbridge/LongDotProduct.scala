package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType}

/** Exact BIGINT-array dot product as a native Catalyst expression — the
  * codegen'd twin of the `aggregate(zip_with(a, b, (x,y) -> x*y), 0,
  * (acc,v) -> acc+v)` fold the exact-integer ANN family scores with.
  * Catalyst's higher-order functions evaluate INTERPRETED per element; at
  * |corpus|×|probes|×64 elements that lambda chain is the single hottest
  * loop in the IVF maintenance lifecycle (round-15 measurement: ~4 s of a
  * 6 s op at sf0.1). This expression runs the same arithmetic inside
  * whole-stage codegen at ~100× the per-element rate, with semantics
  * identical to the fold over the common prefix: Σ a(i)·b(i), NULL only
  * when a whole input array is NULL (same contract as CosineSimilarity —
  * element nulls read as 0).
  */
case class LongDotProduct(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_ldot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L; var i = 0
    while (i < n) { acc += x.getLong(i) * y.getLong(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) =>
      s"""int ${ev.value}_n = java.lang.Math.min($x.numElements(), $y.numElements());
         |long ${ev.value}_acc = 0L;
         |for (int ${ev.value}_i = 0; ${ev.value}_i < ${ev.value}_n; ${ev.value}_i++) {
         |  ${ev.value}_acc += $x.getLong(${ev.value}_i) * $y.getLong(${ev.value}_i);
         |}
         |${ev.value} = ${ev.value}_acc;
       """.stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
