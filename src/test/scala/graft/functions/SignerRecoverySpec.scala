package graft.functions

import java.math.BigInteger
import org.scalatest.funsuite.AnyFunSuite

/** F9 signer recovery against public test vectors (the EIP-155 appendix
  * example) plus sign→recover round-trips, shaped like the reference's
  * signed-tx fixtures (store/store_test.go:45-58).
  */
class SignerRecoverySpec extends AnyFunSuite {

  private def hex(s: String): Array[Byte] =
    s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  test("keccak256 matches the published test vectors") {
    assert(Keccak256.hash("").map("%02x".format(_)).mkString ==
      "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470")
    assert(Keccak256.hash("abc").map("%02x".format(_)).mkString ==
      "4e03657aea45a94fc7d47ba826c8d667c0d1e6e33a64a036ec44f58fa12d6c45")
    // > 1 rate block (136 bytes) exercises multi-block absorption
    val long = "a" * 200
    assert(Keccak256.hash(long).length == 32)
  }

  test("keccak256 derives the ERC20 Transfer event signature constant") {
    // the sentinel hardcoded from store/event_erc20.go:32-35 must equal
    // keccak256 of the canonical event signature — cross-validates both
    assert(Keccak256.hash("Transfer(address,address,uint256)").toSeq ==
      graft.chain.Schemas.Sentinels.TransferSig.toSeq)
  }

  test("secp256k1 base-point arithmetic sanity") {
    import Secp256k1._
    assert(onCurve(G))
    assert(mul(G, N) == Infinity)
    val two = mul(G, BigInteger.TWO)
    assert(two == add(G, G))
    assert(onCurve(two))
  }

  test("EIP-155 appendix vector: signing hash and recovered signer") {
    // From the EIP-155 specification: nonce 9, gasprice 20 gwei, gas 21000,
    // to 0x3535…35, value 10^18, no data, chain id 1.
    val to = hex("3535353535353535353535353535353535353535")

    // signed with private key 0x4646…46 → v = 37 and the published r/s;
    // published sender address 0x9d8A62f656a8d1615C1294fd71e9CFb3E4855A4F
    val r = new BigInteger("18515461264373351373200002665853028612451056578545711640558177340181847433846")
    val s = new BigInteger("46948507304638947509940763649030358759909902576025900602547168820602576006531")
    val priv   = new BigInteger("4646464646464646464646464646464646464646464646464646464646464646", 16)
    val expect = hex("9d8a62f656a8d1615c1294fd71e9cfb3e4855a4f")
    // the key itself derives the same address — keccak + curve agree
    assert(Secp256k1.pointToAddress(Secp256k1.mul(Secp256k1.G, priv)).toSeq == expect.toSeq)

    def pad32(b: Array[Byte]) = {
      val out = new Array[Byte](32)
      val raw = b.dropWhile(_ == 0)
      System.arraycopy(raw, 0, out, 32 - raw.length, raw.length)
      out
    }
    val got = ChainFunctions.recoverSignerAddress(
      9L, new BigInteger("20000000000"), 21000L, to,
      new BigInteger("1000000000000000000"), Array.emptyByteArray,
      37L, pad32(r.toByteArray), pad32(s.toByteArray))
    assert(got != null)
    assert(got.toSeq == expect.toSeq)
  }

  test("sign → recover round-trips across keys, chains, and tx shapes") {
    val cases = Seq(
      // (privKey hex seed, chainId, to?, payload)
      ("11" * 32, 1L, true, Array.emptyByteArray),
      ("22" * 32, 61L, true, Array[Byte](1, 2, 3)),
      ("33" * 32, 0L, true, Array.emptyByteArray),        // legacy (pre-155)
      ("a1" * 32, 1337L, false, Array[Byte](-1, 0, 127))) // contract creation
    cases.foreach { case (privHex, chainId, hasTo, payload) =>
      val priv   = new BigInteger(privHex, 16)
      val sender = Secp256k1.pointToAddress(Secp256k1.mul(Secp256k1.G, priv))
      val to     = if (hasTo) new Array[Byte](20) else null
      val hash = ChainFunctions.signingHash(
        7L, new BigInteger("1000000000"), 50000L, to,
        new BigInteger("123456789"), payload, chainId)
      val (r, s, recId) = Secp256k1.signWithK(hash, priv,
        new BigInteger("deadbeef" * 8, 16))
      val v = if (chainId > 0) 2 * chainId + 35 + recId else 27L + recId
      def pad32(x: BigInteger) = {
        val out = new Array[Byte](32)
        val raw = x.toByteArray.dropWhile(_ == 0)
        System.arraycopy(raw, 0, out, 32 - raw.length, raw.length)
        out
      }
      val got = ChainFunctions.recoverSignerAddress(
        7L, new BigInteger("1000000000"), 50000L, to,
        new BigInteger("123456789"), payload, v, pad32(r), pad32(s))
      assert(got != null, s"chainId=$chainId")
      assert(got.toSeq == sender.toSeq, s"chainId=$chainId")
    }
  }

  test("invalid signatures recover to null, not garbage") {
    val to = new Array[Byte](20)
    // v outside {27, 28, >=35}
    assert(ChainFunctions.recoverSignerAddress(0L, BigInteger.ONE, 21000L, to,
      BigInteger.ZERO, null, 5L, new Array[Byte](32), new Array[Byte](32)) == null)
    // r = 0
    assert(ChainFunctions.recoverSignerAddress(0L, BigInteger.ONE, 21000L, to,
      BigInteger.ZERO, null, 27L, new Array[Byte](32), Array.fill[Byte](32)(1)) == null)
  }
}
