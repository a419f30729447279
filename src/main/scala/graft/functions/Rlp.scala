package graft.functions

import java.math.BigInteger

/** Minimal RLP encoder — just enough to rebuild the legacy/EIP-155 signing
  * payload (the input to the signing hash that `types.Sender` verifies in
  * the reference's tx conversion, common/utils.go:120-127).
  */
object Rlp {

  sealed trait Item
  final case class Bytes(b: Array[Byte]) extends Item
  final case class Items(xs: Seq[Item])  extends Item

  def fromLong(v: Long): Bytes            = fromBigInteger(BigInteger.valueOf(v))
  def fromBigInteger(v: BigInteger): Bytes = {
    require(v.signum >= 0, "RLP integers are unsigned")
    if (v.signum == 0) Bytes(Array.emptyByteArray)
    else Bytes(v.toByteArray.dropWhile(_ == 0))
  }

  def encode(item: Item): Array[Byte] = item match {
    case Bytes(b) =>
      if (b.length == 1 && (b(0) & 0xff) < 0x80) b
      else lengthPrefix(b.length, 0x80) ++ b
    case Items(xs) =>
      val payload = xs.toArray.flatMap(encode)
      lengthPrefix(payload.length, 0xc0) ++ payload
  }

  private def lengthPrefix(len: Int, base: Int): Array[Byte] =
    if (len <= 55) Array((base + len).toByte)
    else {
      val lenBytes = BigInteger.valueOf(len.toLong).toByteArray.dropWhile(_ == 0)
      Array((base + 55 + lenBytes.length).toByte) ++ lenBytes
    }
}
