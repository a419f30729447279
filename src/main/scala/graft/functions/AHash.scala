package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Image average-hash of a BI_RGB BMP payload as a NATIVE Catalyst
  * expression — the m10/WhtEnergies lesson applied to the image
  * fingerprint: the declarative form needed the gray array inside TWO
  * downstream lambdas (the mean fold and the per-bit comparison), and
  * after `CollapseProject` inlining, the mean — itself carrying a full
  * copy of the 36-byte-extract gray tree — re-evaluated once per BIT,
  * blowing the per-row cost out by the pixel count and stalling the
  * bench. `doGenCode` emits one static call that walks the padded
  * bottom-up stride once: gray = (b+g+r)/3 per pixel, integer mean, bit
  * i set when gray_i > mean.
  *
  * Returns SQL NULL for anything that is not an uncompressed 24-bit BMP
  * (counted upstream, not dropped — the m5 discipline).
  */
case class AHashExpr(child: Expression, maxPixels: Int) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean  = true
  override def prettyName: String = "image_ahash"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires BINARY input, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    AHash.compute(input.asInstanceOf[Array[Byte]], maxPixels)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      // ev.value is a primitive `long` slot (dataType = LongType); the kernel
      // returns a boxed Long so a failed decode can yield SQL NULL. Stage
      // through a boxed temp — assigning the boxed result straight into the
      // primitive slot and comparing it to null does not compile under Janino
      // (the expression would silently fall back to interpreted eval).
      val boxed = ctx.freshName("ahash")
      s"""java.lang.Long $boxed = graft.functions.AHash.compute($c, $maxPixels);
         |${ev.isNull} = ($boxed == null);
         |${ev.value} = ${ev.isNull} ? -1L : $boxed.longValue();""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): AHashExpr =
    copy(child = newChild)
}

object AHash {

  /** Static kernel for both interpreted and generated code. Boxed Long so
    * a failed decode can yield SQL NULL. Identical geometry rules to
    * `Multimodal.decodeBmpRgb` (Long math against header-claimed
    * dimensions — attacker input must not overflow the bounds check).
    */
  def compute(p: Array[Byte], maxPixels: Int): java.lang.Long = {
    if (p == null || p.length < 54) return null
    def le(pos: Int, width: Int): Long = {
      var v = 0L; var i = 0
      while (i < width) { v |= (p(pos - 1 + i) & 0xFFL) << (8 * i); i += 1 }
      v
    }
    def leS32(pos: Int): Long = { val u = le(pos, 4); if (u >= 2147483648L) u - 4294967296L else u }
    if (p(0) != 'B'.toByte || p(1) != 'M'.toByte) return null
    if (le(27, 2) != 1L || le(29, 2) != 24L || le(31, 4) != 0L) return null
    val w = leS32(19); val h = leS32(23)
    if (w <= 0 || h <= 0) return null
    val off = le(11, 4)
    val rowSize = (w * 3 + 3) / 4 * 4
    val n = math.min(w * h, math.min(maxPixels.toLong, 64L)).toInt
    val grays = new Array[Long](n)
    var sum = 0L
    var i = 0
    while (i < n) {
      val base = off + (i / w) * rowSize + (i % w) * 3
      if (base + 3 > p.length) return null // truncated payload
      val g = ((p(base.toInt) & 0xFF) + (p(base.toInt + 1) & 0xFF) +
        (p(base.toInt + 2) & 0xFF)) / 3
      grays(i) = g
      sum += g
      i += 1
    }
    val mean = sum / n
    var hash = 0L
    i = 0
    while (i < n) { if (grays(i) > mean) hash |= 1L << i; i += 1 }
    java.lang.Long.valueOf(hash)
  }

  def apply(c: Column, maxPixels: Int = 64): Column =
    GraftSqlBridge.column(AHashExpr(GraftSqlBridge.expression(c), maxPixels))
}
