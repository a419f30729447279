package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Walsh–Hadamard sequency-band energies of a PCM WAV payload as a NATIVE
  * Catalyst expression.
  *
  * The declarative form (transform-over-k of aggregate-over-zip_with on a
  * derived sample array) looked innocent but benched at ~60 s for 5 000
  * rows: `CollapseProject` inlines the hex-parse sample extraction INTO
  * the per-coefficient lambda (lexically it is referenced once), so the
  * substring/conv byte-decode chain re-evaluates n×n = 4 096 times per
  * row, and higher-order functions run interpreted besides. `doGenCode`
  * emits one static call that parses each byte once and runs the O(n log n)
  * fast-WHT butterfly — the PqEncode lesson applied to DSP.
  *
  * Semantics are identical to the declarative form and the SQL oracle:
  * RIFF/WAVE + PCM-16 validation, header sample count clamped to the
  * bytes present, first `nSamples` samples (zero-padded when fewer),
  * W_k = Σᵢ (−1)^popcount(i∧k) sᵢ, band b = Σ_{k∈b} W_k² — exact 64-bit
  * integer arithmetic end to end. Invalid payloads yield all-zero bands
  * (counted, not dropped — the m5 discipline).
  */
case class WhtEnergiesExpr(child: Expression, nSamples: Int, nBands: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean  = child.nullable
  override def prettyName: String = "wht_band_energies"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires BINARY input, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    WhtEnergies.bandEnergies(input.asInstanceOf[Array[Byte]], nSamples, nBands)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WhtEnergies.bandEnergies($c, $nSamples, $nBands);")

  override protected def withNewChildInternal(newChild: Expression): WhtEnergiesExpr =
    copy(child = newChild)
}

object WhtEnergies {

  private final val DataOffset = 45 // 1-based first byte of WAV sample data

  /** Static kernel for both interpreted and generated code: minimal WAV
    * validation, sample extract (zero-padded), in-place fast WHT
    * butterfly, per-band sum of squares. Exact longs throughout.
    */
  def bandEnergies(payload: Array[Byte], nSamples: Int, nBands: Int): ArrayData = {
    val perBand = nSamples / nBands
    val s = new Array[Long](nSamples)
    if (valid(payload)) {
      val channels  = le(payload, 23, 2) // NumChannels at offset 23, NOT the format field at 21
      val headerLen = le(payload, 41, 4)
      val present   = math.max(payload.length - (DataOffset - 1), 0).toLong
      // decodeWavPcm geometry: clamp the data length FIRST, then frames =
      // dataLen / (2·channels) — the two differ for a truncated stereo file
      val dataLen = math.min(headerLen, present)
      val avail = math.min(dataLen / (channels * 2L), nSamples.toLong).toInt
      var i = 0
      while (i < avail) {
        val u = (payload(DataOffset - 1 + 2 * i) & 0xFF) |
          ((payload(DataOffset + 2 * i) & 0xFF) << 8)
        s(i) = if (u >= 32768) u - 65536 else u
        i += 1
      }
      // fast WHT butterfly: O(n log n), natural (Hadamard) coefficient order —
      // identical to the direct Σ (−1)^popcount(i∧k) definition
      var h = 1
      while (h < nSamples) {
        var j = 0
        while (j < nSamples) {
          var k = j
          while (k < j + h) {
            val x = s(k); val y = s(k + h)
            s(k) = x + y; s(k + h) = x - y
            k += 1
          }
          j += 2 * h
        }
        h *= 2
      }
    }
    val bands = new Array[Long](nBands)
    var b = 0
    while (b < nBands) {
      var e = 0L
      var k = b * perBand
      while (k < (b + 1) * perBand) { e += s(k) * s(k); k += 1 }
      bands(b) = e
      b += 1
    }
    new GenericArrayData(bands)
  }

  // same validation set as Multimodal.decodeWavPcm: all four chunk magics,
  // PCM format 1, 16-bit, ≥1 channel
  private def valid(p: Array[Byte]): Boolean =
    p != null && p.length >= DataOffset - 1 &&
      ascii(p, 1, 4) == "RIFF" && ascii(p, 9, 4) == "WAVE" &&
      ascii(p, 13, 4) == "fmt " && ascii(p, 37, 4) == "data" &&
      le(p, 21, 2) == 1L && le(p, 35, 2) == 16L && le(p, 23, 2) >= 1L

  private def ascii(p: Array[Byte], pos: Int, n: Int): String =
    new String(p, pos - 1, n, "US-ASCII")

  private def le(p: Array[Byte], pos: Int, width: Int): Long = {
    var v = 0L; var i = 0
    while (i < width) { v |= (p(pos - 1 + i) & 0xFFL) << (8 * i); i += 1 }
    v
  }

  def apply(c: Column, nSamples: Int, nBands: Int): Column =
    GraftSqlBridge.column(WhtEnergiesExpr(GraftSqlBridge.expression(c), nSamples, nBands))
}
