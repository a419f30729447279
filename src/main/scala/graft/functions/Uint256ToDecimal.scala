package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** uint256 big-endian bytes → Decimal(38,0), as a NATIVE Catalyst
  * expression: `doGenCode` emits a static call, so the conversion stays
  * inside whole-stage codegen instead of detouring through a ScalaUDF's
  * row encoder (the hot path of ERC20 value decoding —
  * ref store/event_erc20.go:37-62, our Transforms.erc20Transfers).
  *
  * Values above 10^38−1 (the reference's own cap is varchar(32) ≤ 10^32−1,
  * model/types.go:72-81) return SQL NULL rather than a wrong value.
  */
case class Uint256ToDecimal(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DecimalType(38, 0)
  override def nullable: Boolean  = true
  override def prettyName: String = "uint256_to_decimal"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires BINARY input, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(input: Any): Any =
    Uint256ToDecimal.convert(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.functions.Uint256ToDecimal.convert($c);
         |${ev.isNull} = ${ev.value} == null;""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Uint256ToDecimal =
    copy(child = newChild)
}

object Uint256ToDecimal {

  /** Static conversion target for both interpreted and generated code. */
  def convert(b: Array[Byte]): Decimal = {
    if (b == null) return null
    val bi =
      if (b.isEmpty) java.math.BigInteger.ZERO
      else new java.math.BigInteger(1, b)
    val d = Decimal(BigDecimal(bi))
    if (d.changePrecision(38, 0)) d else null
  }

  def apply(c: Column): Column =
    GraftSqlBridge.column(Uint256ToDecimal(GraftSqlBridge.expression(c)))
}
