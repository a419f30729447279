package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Sign-random-projection LSH bucket id as a NATIVE Catalyst expression:
  * bit p of the result is the sign of ⟨vec, plane_p⟩ over `nPlanes`
  * deterministic integer-lattice hyperplanes. The declarative form was an
  * nPlanes·dim-term tree (1024 boxed nodes per row at 16×64) evaluated
  * outside any tight loop; `doGenCode` emits one static call into plain
  * JVM loops inside whole-stage codegen.
  *
  * Projection folds left-to-right over ascending dimension, matching the
  * SQL-oracle mirror that inlines the same `planeWeight` lattice.
  */
case class SignProjectionExpr(child: Expression, dim: Int, nPlanes: Int)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean  = child.nullable
  override def prettyName: String = "sign_projection"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<FLOAT> input, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    SignProjection.bucket(input.asInstanceOf[ArrayData], dim, nPlanes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SignProjection.bucket($c, $dim, $nPlanes);")

  override protected def withNewChildInternal(newChild: Expression): SignProjectionExpr =
    copy(child = newChild)
}

object SignProjection {

  /** Deterministic hyperplane component: fixed integer lattice mapped to
    * [-9, 9], reproducible in any engine (mirrored by the SQL oracles).
    */
  def planeWeight(plane: Int, dim: Int): Double =
    (((plane.toLong * 2654435761L + dim.toLong * 40503L + 12345L) % 19L + 19L) % 19L - 9L).toDouble

  /** Static bucket target for both interpreted and generated code. */
  def bucket(vec: ArrayData, dim: Int, nPlanes: Int): Long = {
    var bits = 0L
    var p = 0
    while (p < nPlanes) {
      var proj = 0.0
      var i = 0
      while (i < dim) {
        proj += vec.getFloat(i).toDouble * planeWeight(p, i)
        i += 1
      }
      if (proj >= 0.0) bits |= 1L << p
      p += 1
    }
    bits
  }

  def apply(c: Column, dim: Int, nPlanes: Int): Column =
    GraftSqlBridge.column(SignProjectionExpr(GraftSqlBridge.expression(c), dim, nPlanes))
}
