package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Jaro-Winkler string similarity as a NATIVE Catalyst expression — the
  * record-linkage verifier (d18). A Scala UDF here would box both strings
  * and break whole-stage codegen on the verify projection that runs once
  * per candidate pair; `doGenCode` emits one static call over the raw
  * UTF8String bytes with no intermediate allocation beyond the two match
  * flag arrays.
  *
  * Semantics are pinned to DuckDB's `jaro_winkler_similarity` (the oracle
  * engine), byte-for-byte — brute-forced against it on 120k random pairs
  * at build time, zero mismatches:
  *   - operates on UTF-8 BYTES, not code points (DuckDB is byte-based;
  *     for the ASCII keys the linkage operator feeds this is also
  *     codepoint-identical),
  *   - either side empty → 0.0 (both empty is NOT 1.0),
  *   - match window = max(len)/2 - 1, floored at 0,
  *   - transpositions floor-halved,
  *   - Winkler boost only when jaro > 0.7, common prefix capped at 4,
  *     scale 0.1.
  */
case class JaroWinklerExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (STRING, STRING), got (${l.catalogString}, ${r.catalogString})")
    }

  override protected def nullSafeEval(l: Any, r: Any): Any =
    JaroWinkler.similarity(l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // dataType is a primitive double and the kernel never returns null for
    // non-null inputs, so the plain nullSafeCodeGen assignment is safe —
    // no boxed staging needed (contrast AHashExpr's nullable long).
    nullSafeCodeGen(ctx, ev, (c1, c2) =>
      s"${ev.value} = graft.functions.JaroWinkler.similarity($c1, $c2);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinklerExpr =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {

  /** Static kernel for both interpreted and generated code. Byte-based
    * (see [[JaroWinklerExpr]]); O(|s| · window) via the standard greedy
    * leftmost-match assignment.
    */
  def similarity(a: UTF8String, b: UTF8String): Double = {
    val s  = a.getBytes
    val t  = b.getBytes
    val ls = s.length
    val lt = t.length
    if (ls == 0 || lt == 0) return 0.0
    val window = math.max(math.max(ls, lt) / 2 - 1, 0)
    val sM = new Array[Boolean](ls)
    val tM = new Array[Boolean](lt)
    var m = 0
    var i = 0
    while (i < ls) {
      val hi = math.min(lt - 1, i + window)
      var j  = math.max(0, i - window)
      var found = false
      while (j <= hi && !found) {
        if (!tM(j) && s(i) == t(j)) {
          sM(i) = true; tM(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var k     = 0
    var trans = 0
    i = 0
    while (i < ls) {
      if (sM(i)) {
        while (!tM(k)) k += 1
        if (s(i) != t(k)) trans += 1
        k += 1
      }
      i += 1
    }
    val jaro = (m.toDouble / ls + m.toDouble / lt +
      (m - trans / 2).toDouble / m) / 3.0
    if (jaro > 0.7) {
      val max = math.min(4, math.min(ls, lt))
      var l   = 0
      while (l < max && s(l) == t(l)) l += 1
      jaro + l * 0.1 * (1.0 - jaro)
    } else jaro
  }

  /** Column face. */
  def jaroWinkler(a: Column, b: Column): Column =
    GraftSqlBridge.column(JaroWinklerExpr(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))
}
