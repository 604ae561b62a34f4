package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{AbstractDataType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd Unicode normalization (java.text.Normalizer) as a native
  * Catalyst expression — Spark ships no normalization builtin, and a text
  * pipeline that fingerprints/dedups multi-script corpora MUST canonicalize
  * first (the same user-visible string has many code-point spellings; an
  * un-normalized corpus hashes "café" two ways). `form` is a compile-time
  * literal ("NFC"/"NFD"/"NFKC"/"NFKD"), so codegen embeds the Form constant
  * directly; the engine-exactness twin on the DuckDB side is
  * nfc_normalize() for NFC. Null-intolerant unary over STRING.
  */
case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression with ExpectsInputTypes {

  require(Seq("NFC", "NFD", "NFKC", "NFKD").contains(form),
    s"unsupported normalization form $form")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "unicode_normalize"

  @transient private lazy val f = java.text.Normalizer.Form.valueOf(form)

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    UTF8String.fromString(java.text.Normalizer.normalize(s, f))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |  java.text.Normalizer.normalize($c.toString(),
         |    java.text.Normalizer.Form.$form));
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
