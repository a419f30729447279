package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Cosine similarity as a NATIVE Catalyst expression — the codegen'd twin
  * of the declarative `Similarity.cosine` (an `aggregate`/`zip_with`/
  * `transform` chain). Higher-order functions do not participate in
  * whole-stage codegen: every element of every vector evaluated a boxed
  * lambda node per row, and cosine is THE per-candidate kernel of the
  * whole similarity tier (the within-cell SemDeDup verify, brute-force /
  * LSH / IVF ranking, recall audits) — tens of interpreted microseconds
  * per pair where a fused loop costs tens of nanoseconds.
  *
  * Semantics are bit-identical to the declarative form, branch for
  * branch:
  *   - dot and both norms accumulate LEFT-TO-RIGHT in double (the
  *     `aggregate` fold order), elements widened exactly as `cast(x as
  *     double)` widens float/double;
  *   - nn = sqrt(‖a‖²)·sqrt(‖b‖²); nn == 0.0 → 0.0 (checked FIRST, as
  *     `when(nn === 0, 0.0)` does, so two zero/empty vectors — even of
  *     different lengths — score 0.0, never NaN);
  *   - length mismatch → NULL (zip_with pads the shorter side with
  *     nulls, the null product nulls the fold, and the `otherwise`
  *     branch propagates it);
  *   - any NULL element → NULL (a null element nulls its fold, which
  *     nulls nn, fails the `=== 0` test, and propagates);
  *   - NaN/Infinity components flow through IEEE arithmetic untouched —
  *     identical in both forms.
  */
case class CosineSimExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean  = true // length mismatch / null element → NULL
  override def prettyName: String = "cosine_sim"

  private def elemOk(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(left.dataType) && elemOk(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two ARRAY<FLOAT|DOUBLE> inputs, got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")

  private def isFloat(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    CosineSim.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      isFloat(left.dataType), isFloat(right.dataType))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val (af, bf) = (isFloat(left.dataType), isFloat(right.dataType))
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val boxed = ctx.freshName("cos")
      s"""java.lang.Double $boxed = graft.functions.CosineSim.cosine($a, $b, $af, $bf);
         |${ev.isNull} = $boxed == null;
         |${ev.value} = ${ev.isNull} ? 0.0 : $boxed.doubleValue();""".stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): CosineSimExpr =
    copy(left = newLeft, right = newRight)
}

object CosineSim {

  /** Static kernel for both interpreted and generated code. Boxes exactly
    * one Double (or null) per call; the element loops are allocation-free.
    */
  def cosine(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): java.lang.Double = {
    val la = a.numElements()
    val lb = b.numElements()
    // null elements null the declarative folds → NULL result
    var i = 0
    while (i < la) { if (a.isNullAt(i)) return null; i += 1 }
    i = 0
    while (i < lb) { if (b.isNullAt(i)) return null; i += 1 }
    var n2a = 0.0
    i = 0
    while (i < la) {
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      n2a += x * x; i += 1
    }
    var n2b = 0.0
    i = 0
    while (i < lb) {
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      n2b += y * y; i += 1
    }
    val nn = math.sqrt(n2a) * math.sqrt(n2b)
    // the `when(nn === 0, 0.0)` branch fires BEFORE the dot is consumed
    if (nn == 0.0) return java.lang.Double.valueOf(0.0)
    // zip_with pads a length mismatch with nulls → null dot → NULL result
    if (la != lb) return null
    var d = 0.0
    i = 0
    while (i < la) {
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      d += x * y; i += 1
    }
    java.lang.Double.valueOf(d / nn)
  }

  def apply(a: Column, b: Column): Column =
    GraftSqlBridge.column(CosineSimExpr(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))
}
