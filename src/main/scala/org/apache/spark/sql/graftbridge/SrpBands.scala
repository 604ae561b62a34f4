package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, LongType}

/** Signed-random-projection band signature: one pass over the embedding
  * computes every hyperplane dot product and packs the sign bits into
  * per-band bucket values (little-endian within a band) — the candidate
  * shuffle keys of the SRP-LSH dedup path (`llm_dedup_embed_lsh`).
  *
  * A native expression for two reasons:
  *  - the HOF formulation (`transform(planes, ...)` + per-band
  *    `aggregate`) is fully interpreted AND CollapseProject inlines the
  *    bit-vector projection into the band lambda, recomputing all `planes`
  *    dot products once per (band, bit) reference — planes² dots/row
  *    (measured 10× the whole bench suite at 128 planes);
  *  - here the plane matrix is a flat primitive double[] and the whole
  *    signature is planes·dim fused multiply-adds in one JIT'd loop.
  *
  * Sign semantics match the declarative original and the DuckDB oracle
  * bit-for-bit: bit set iff round(dot, 4) >= 0 with HALF_UP rounding
  * (exactly Spark's `round` on DoubleType; -0.0 >= 0 holds in both
  * engines, so boundary dots agree).
  */
case class SrpBands(child: Expression, planes: Array[Array[Double]], bits: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "srp_bands"

  @transient private lazy val dims = if (planes.isEmpty) 0 else planes(0).length
  @transient private lazy val flat: Array[Double] = {
    val out = new Array[Double](planes.length * dims)
    var p = 0
    while (p < planes.length) {
      System.arraycopy(planes(p), 0, out, p * dims, dims); p += 1
    }
    out
  }

  def compute(a: ArrayData): ArrayData = {
    val n = math.min(a.numElements(), dims)
    val out = new Array[Long](planes.length / bits)
    var p = 0
    while (p < planes.length) {
      var dot = 0.0
      val off = p * dims
      var i = 0
      while (i < n) { dot += a.getDouble(i) * flat(off + i); i += 1 }
      val r =
        if (java.lang.Double.isNaN(dot) || java.lang.Double.isInfinite(dot)) dot
        else java.math.BigDecimal.valueOf(dot)
          .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
      if (r >= 0) out(p / bits) |= 1L << (p % bits)
      p += 1
    }
    new GenericArrayData(out)
  }

  override protected def nullSafeEval(a: Any): Any =
    compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val ref = ctx.addReferenceObj("srpBands", this, classOf[SrpBands].getName)
      s"${ev.value} = $ref.compute($x);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
