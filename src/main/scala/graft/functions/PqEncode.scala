package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Product-quantization encoder as a NATIVE Catalyst expression.
  *
  * The declarative form of this kernel is a dim·k-term expression tree
  * (per subspace: k squared-L2 distances over dim/m components, then an
  * argmin) — at 64 dims × 16 centroids that tree is evaluated per row
  * through thousands of boxed expression nodes and dominated the bench.
  * `doGenCode` instead emits one static call into tight JVM loops, so the
  * encode stays inside whole-stage codegen at a few hundred flops/row.
  *
  * Distances fold left-to-right over ascending component index and ties
  * take the lowest centroid index, identical to the SQL-oracle mirror's
  * `list_min([dist, j])` construction.
  */
case class PqEncodeExpr(child: Expression, dim: Int, m: Int, k: Int)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean  = child.nullable
  override def prettyName: String = "pq_encode"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<FLOAT> input, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    PqEncode.encode(input.asInstanceOf[ArrayData], dim, m, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.PqEncode.encode($c, $dim, $m, $k);")

  override protected def withNewChildInternal(newChild: Expression): PqEncodeExpr =
    copy(child = newChild)
}

object PqEncode {

  /** Deterministic codebook entry: component t of centroid j in subspace
    * sub, on an exact quarter-integer lattice in [-2.25, 2.25] — quarters
    * are binary-exact doubles, so assignment is bit-identical in any IEEE
    * engine (and in the DuckDB oracle, which inlines the same formula).
    */
  def codeWeight(sub: Int, j: Int, t: Int): Double =
    ((sub * 131 + j * 17 + t * 7) % 19 - 9) / 4.0

  /** Static encode target for both interpreted and generated code. */
  def encode(vec: ArrayData, dim: Int, m: Int, k: Int): Long = {
    val dsub = dim / m
    var packed = 0L
    var mult = 1L
    var sub = 0
    while (sub < m) {
      var best = 0
      var bestD = Double.MaxValue
      var j = 0
      while (j < k) {
        var dist = 0.0
        var t = 0
        while (t < dsub) {
          val d = vec.getFloat(sub * dsub + t).toDouble - codeWeight(sub, j, t)
          dist += d * d
          t += 1
        }
        if (dist < bestD) { bestD = dist; best = j }
        j += 1
      }
      packed += best * mult
      mult *= k
      sub += 1
    }
    packed
  }

  def apply(c: Column, dim: Int, m: Int, k: Int): Column =
    GraftSqlBridge.column(PqEncodeExpr(GraftSqlBridge.expression(c), dim, m, k))
}
