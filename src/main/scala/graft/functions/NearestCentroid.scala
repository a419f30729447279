package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Nearest-centroid argmax as a NATIVE Catalyst expression: given a row's
  * vector and the full centroid table as ONE broadcast array of
  * (cid, cvec, cnorm) structs, return the id of the highest-cosine
  * centroid, ties to the lowest id.
  *
  * This is the assignment stage of the whole IVF/k-means family
  * (s3/s4/s12/s16/d12/s19) collapsed to per-row math: no n·k candidate
  * relation ever materializes, so there is NOTHING to shuffle, sort, or
  * aggregate — the former row_number-window form moved the full n·k
  * crossed relation through an exchange, and the max_by-aggregation form
  * (struct-with-array buffer) fell out of hash aggregation into a
  * SortAggregate that sorted n·k rows per task. Here the k-way loop runs
  * inside whole-stage codegen and the only data movement is the one-row
  * centroid broadcast (k·dim floats — the same bytes the join-based forms
  * broadcast anyway).
  *
  * Semantics are bit-identical to the declarative original:
  * cosine = seqdot/(‖a‖·‖b‖) with left-to-right double accumulation
  * (matching `zip_with`/`aggregate` fold order), 0 when either norm is 0,
  * rounded HALF_UP to 6 decimals exactly as Spark's `round(_, 6)` does
  * for doubles; a length-mismatched centroid scores null-like (sorts
  * last, ties still to lowest id) exactly as the windowed form ordered
  * null similarities.
  *
  * KNOWN NaN DIVERGENCE from the windowed original: Spark's desc
  * ordering ranks NaN ABOVE every real number, so a window would pick a
  * NaN-similarity centroid first; this loop's `sim > bestSim` never
  * selects NaN (every comparison with NaN is false), so NaN-scoring
  * centroids are skipped, and an input for which EVERY centroid scores
  * NaN (or an empty centroid array) returns SQL NULL — no centroid was
  * comparable, and "no answer" must be representable as no answer, not
  * a wrapping sentinel (rounds ≤14 returned Long.MaxValue here, which
  * narrows under an idType cast). NaN can only arise from NaN/Infinite
  * vector components — the embedding ingestion paths round() all
  * components to finite decimals, so no in-repo caller can produce the
  * NULL; a caller feeding raw unvalidated floats gets nulls to filter
  * instead of phantom centroid ids.
  */
case class NearestCentroidExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  // nullable regardless of the children: the all-NaN / empty-centroid
  // input evaluates to NULL (see the class doc's NaN note)
  override def nullable: Boolean  = true
  override def prettyName: String = "nearest_centroid"

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType, _),
          ArrayType(StructType(Array(
            StructField(_, LongType, _, _),
            StructField(_, ArrayType(FloatType, _), _, _),
            StructField(_, DoubleType, _, _))), _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (ARRAY<FLOAT>, ARRAY<STRUCT<BIGINT, ARRAY<FLOAT>, DOUBLE>>), " +
        s"got (${l.catalogString}, ${r.catalogString})")
  }

  override protected def nullSafeEval(vec: Any, cents: Any): Any =
    NearestCentroid.assign(vec.asInstanceOf[ArrayData], cents.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, c) => {
      val boxed = ctx.freshName("cid")
      s"""java.lang.Long $boxed = graft.functions.NearestCentroid.assign($v, $c);
         |${ev.isNull} = $boxed == null;
         |${ev.value} = ${ev.isNull} ? -1L : $boxed.longValue();""".stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): NearestCentroidExpr =
    copy(left = newLeft, right = newRight)
}

/** The companion of [[NearestCentroidExpr]] returning the winning
  * (rounded) cosine instead of the id — consumers that need BOTH (the
  * IVF health telemetry's per-cell similarity distribution) run the two
  * expressions side by side in the same projection: twice the k·dim
  * FLOPs inside codegen, still ZERO shuffle, where the windowed
  * formulation moved the whole n·k candidate relation through an
  * exchange.
  */
case class NearestCentroidSimExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean  = true // all-NaN/empty input → NULL, like the id twin
  override def prettyName: String = "nearest_centroid_sim"

  override def checkInputDataTypes(): TypeCheckResult =
    NearestCentroidExpr(left, right).checkInputDataTypes()

  override protected def nullSafeEval(vec: Any, cents: Any): Any =
    NearestCentroid.assignSim(vec.asInstanceOf[ArrayData], cents.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, c) => {
      val boxed = ctx.freshName("sim")
      s"""java.lang.Double $boxed = graft.functions.NearestCentroid.assignSim($v, $c);
         |${ev.isNull} = $boxed == null;
         |${ev.value} = ${ev.isNull} ? 0.0 : $boxed.doubleValue();""".stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): NearestCentroidSimExpr =
    copy(left = newLeft, right = newRight)
}

object NearestCentroid {

  /** Static argmax target for both interpreted and generated code.
    * `cents` rows are (cid: long, cvec: float[], cnorm: double) with
    * cnorm = ‖cvec‖ precomputed once at broadcast build (saves k·dim
    * FLOPs per row vs re-deriving it here). Returns null (boxed) when NO
    * centroid was comparable — all-NaN similarities or an empty array.
    */
  def assign(vec: ArrayData, cents: ArrayData): java.lang.Long =
    best(vec, cents, wantSim = false).asInstanceOf[java.lang.Long]

  def assignSim(vec: ArrayData, cents: ArrayData): java.lang.Double =
    best(vec, cents, wantSim = true).asInstanceOf[java.lang.Double]

  /** Shared argmax loop; boxes exactly one value at the end (Long cid,
    * Double sim, or null), keeping the per-centroid hot loop
    * allocation-free.
    */
  private def best(vec: ArrayData, cents: ArrayData, wantSim: Boolean): Any = {
    val dim = vec.numElements()
    var n2a = 0.0
    var i = 0
    while (i < dim) { val x = vec.getFloat(i).toDouble; n2a += x * x; i += 1 }
    val na = math.sqrt(n2a)
    var bestSim = Double.NegativeInfinity
    var bestCid = Long.MaxValue
    var found = false // at least one comparable (non-NaN) centroid seen
    val k = cents.numElements()
    var j = 0
    while (j < k) {
      val c    = cents.getStruct(j, 3)
      val cid  = c.getLong(0)
      val cvec = c.getArray(1)
      // a ragged centroid scores -inf: the windowed original's null
      // similarity, which sorted last with ties still on the id
      var sim = Double.NegativeInfinity
      if (cvec.numElements() == dim) {
        var d = 0.0
        var t = 0
        while (t < dim) { d += vec.getFloat(t).toDouble * cvec.getFloat(t).toDouble; t += 1 }
        val nn  = na * c.getDouble(2)
        val raw = if (nn == 0.0) 0.0 else d / nn
        // exactly Spark's round(double, 6): HALF_UP via BigDecimal,
        // NaN/Inf pass through untouched
        sim = if (java.lang.Double.isNaN(raw) || java.lang.Double.isInfinite(raw)) raw
              else java.math.BigDecimal.valueOf(raw)
                .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
      }
      if (sim > bestSim || (sim == bestSim && cid < bestCid)) {
        bestSim = sim; bestCid = cid; found = true
      }
      j += 1
    }
    // nothing comparable (every sim NaN, or k == 0) → SQL NULL, never a
    // sentinel id that survives casts as a phantom centroid
    if (!found) null
    else if (wantSim) java.lang.Double.valueOf(bestSim)
    else java.lang.Long.valueOf(bestCid)
  }

  def apply(vec: Column, cents: Column): Column =
    GraftSqlBridge.column(NearestCentroidExpr(
      GraftSqlBridge.expression(vec), GraftSqlBridge.expression(cents)))

  def sim(vec: Column, cents: Column): Column =
    GraftSqlBridge.column(NearestCentroidSimExpr(
      GraftSqlBridge.expression(vec), GraftSqlBridge.expression(cents)))
}
