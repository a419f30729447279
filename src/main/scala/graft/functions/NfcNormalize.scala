package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a NATIVE Catalyst expression: crawled text
  * mixes composed and decomposed forms of the same glyph ("é" vs
  * "e"+U+0301), which breaks exact dedup, n-gram matching, and tokenizer
  * vocabularies that only ever saw one form — canonical composition is the
  * standard first pass of a large-corpus text pipeline. Spark ships no
  * normalizer built-in; `doGenCode` emits a static call so the conversion
  * stays inside whole-stage codegen instead of detouring through a
  * ScalaUDF's row encoder (the Uint256ToDecimal discipline).
  *
  * Fast path: `Normalizer.isNormalized` is O(n) with no allocation and
  * nearly all real text is already NFC, so the expensive compose pass runs
  * only on the rows that actually need it.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean  = child.nullable
  override def prettyName: String = "nfc_normalize"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING input, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(input: Any): Any =
    NfcNormalize.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcNormalize.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  import java.text.Normalizer

  /** Static normalization target for both interpreted and generated code. */
  def normalize(s: UTF8String): UTF8String = {
    if (s == null) return null
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }

  def apply(c: Column): Column =
    GraftSqlBridge.column(NfcNormalize(GraftSqlBridge.expression(c)))
}
