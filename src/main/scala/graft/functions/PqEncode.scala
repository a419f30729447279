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

/** Asymmetric distance computation (ADC) between a raw probe vector and a
  * packed PQ code: Σ over subspaces of the squared L2 distance from the
  * probe's subvector to the CODE's reconstructed centroid — the ranking
  * step of IVF-PQ search, where the corpus side is 8-byte codes instead of
  * raw vectors. Native expression for the same reason as PqEncodeExpr: the
  * kernel is a per-(probe, code) numeric loop, not a join or shuffle.
  *
  * Accumulation order is per-subspace inner sums added in ascending
  * subspace order (matching the SQL oracle's nested list_reduce folds), so
  * distances are bit-identical across engines — no rounding needed.
  */
case class PqAdcExpr(left: Expression, right: Expression,
                     dim: Int, m: Int, k: Int)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (ARRAY<FLOAT>, BIGINT), got (${l.catalogString}, ${r.catalogString})")
    }

  override protected def nullSafeEval(vec: Any, code: Any): Any =
    PqEncode.adc(vec.asInstanceOf[ArrayData], code.asInstanceOf[Long], dim, m, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, c) =>
      s"${ev.value} = graft.functions.PqEncode.adc($v, $c, $dim, $m, $k);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdcExpr =
    copy(left = newLeft, right = newRight)
}

object PqEncode {

  /** Deterministic codebook entry: component t of centroid j in subspace
    * sub, on an exact quarter-integer lattice in [-2.25, 2.25] — quarters
    * are binary-exact doubles, so assignment is bit-identical in any IEEE
    * engine (and in the DuckDB oracle, which inlines the same formula).
    */
  def codeWeight(sub: Int, j: Int, t: Int): Double =
    ((sub * 131 + j * 17 + t * 7) % 19 - 9) / 4.0

  /** Input rows shorter than the declared dim would otherwise read past the
    * array inside generated code, and NULL elements would read as 0.0f
    * through `getFloat` and encode silently-wrong codes — surface a clear
    * error for both instead. (The null scan is a per-element bit test on
    * UnsafeArrayData — noise next to the k·dim distance loop.)
    */
  private def requireDim(vec: ArrayData, dim: Int): Unit = {
    if (vec.numElements() < dim)
      throw new IllegalArgumentException(
        s"pq kernel: input vector has ${vec.numElements()} elements, expected >= $dim")
    var i = 0
    while (i < dim) {
      if (vec.isNullAt(i))
        throw new IllegalArgumentException(
          s"pq kernel: input vector has a NULL element at index $i")
      i += 1
    }
  }

  /** Static encode target for both interpreted and generated code. */
  def encode(vec: ArrayData, dim: Int, m: Int, k: Int): Long = {
    requireDim(vec, dim)
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

  /** Static ADC target for both interpreted and generated code: squared
    * L2 from `vec`'s subvectors to the centroids named by `code`'s
    * nibbles (base-k digits), per-subspace inner sums added in ascending
    * subspace order.
    */
  def adc(vec: ArrayData, code: Long, dim: Int, m: Int, k: Int): Double = {
    requireDim(vec, dim)
    val dsub = dim / m
    var total = 0.0
    var rest = code
    var sub = 0
    while (sub < m) {
      val j = (rest % k).toInt
      rest /= k
      var inner = 0.0
      var t = 0
      while (t < dsub) {
        val d = vec.getFloat(sub * dsub + t).toDouble - codeWeight(sub, j, t)
        inner += d * d
        t += 1
      }
      total += inner
      sub += 1
    }
    total
  }

  def apply(c: Column, dim: Int, m: Int, k: Int): Column =
    GraftSqlBridge.column(PqEncodeExpr(GraftSqlBridge.expression(c), dim, m, k))

  def adcColumn(vec: Column, code: Column, dim: Int, m: Int, k: Int): Column =
    GraftSqlBridge.column(PqAdcExpr(
      GraftSqlBridge.expression(vec), GraftSqlBridge.expression(code), dim, m, k))
}
