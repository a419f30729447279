package graft.functions

import java.math.BigInteger

/** secp256k1 ECDSA public-key recovery — the curve math behind
  * `types.Sender` in the reference's tx conversion (common/utils.go:120-127).
  * Implemented from the public curve parameters (SEC 2) with Jacobian
  * point arithmetic (one field inversion per scalar multiplication).
  */
object Secp256k1 {

  val P: BigInteger = new BigInteger(
    "fffffffffffffffffffffffffffffffffffffffffffffffffffffffefffffc2f", 16)
  val N: BigInteger = new BigInteger(
    "fffffffffffffffffffffffffffffffebaaedce6af48a03bbfd25e8cd0364141", 16)
  val Gx: BigInteger = new BigInteger(
    "79be667ef9dcbbac55a06295ce870b07029bfcdb2dce28d959f2815b16f81798", 16)
  val Gy: BigInteger = new BigInteger(
    "483ada7726a3c4655da4fbfc0e1108a8fd17b448a68554199c47d08ffb10d4b8", 16)
  private val Seven = BigInteger.valueOf(7)
  private val Zero  = BigInteger.ZERO
  private val One   = BigInteger.ONE
  private val Two   = BigInteger.TWO
  private val Three = BigInteger.valueOf(3)

  /** Affine point; None-free — the identity is encoded as (null, null). */
  final case class Point(x: BigInteger, y: BigInteger) {
    def isInfinity: Boolean = x == null
  }
  val Infinity: Point = Point(null, null)
  val G: Point        = Point(Gx, Gy)

  private final case class Jac(x: BigInteger, y: BigInteger, z: BigInteger)
  private val JacInf = Jac(One, One, Zero)

  private def toJac(p: Point): Jac =
    if (p.isInfinity) JacInf else Jac(p.x, p.y, One)

  private def fromJac(j: Jac): Point =
    if (j.z.signum == 0) Infinity
    else {
      val zInv  = j.z.modInverse(P)
      val zInv2 = zInv.multiply(zInv).mod(P)
      Point(j.x.multiply(zInv2).mod(P), j.y.multiply(zInv2).multiply(zInv).mod(P))
    }

  private def jDouble(a: Jac): Jac = {
    if (a.z.signum == 0 || a.y.signum == 0) return JacInf
    val y2 = a.y.multiply(a.y).mod(P)
    val s  = a.x.multiply(y2).shiftLeft(2).mod(P)
    val m  = a.x.multiply(a.x).multiply(Three).mod(P) // a-coefficient = 0
    val x2 = m.multiply(m).subtract(s.shiftLeft(1)).mod(P)
    val yy = m.multiply(s.subtract(x2)).subtract(y2.multiply(y2).shiftLeft(3)).mod(P)
    val z2 = a.y.multiply(a.z).shiftLeft(1).mod(P)
    Jac(x2, yy, z2)
  }

  private def jAdd(a: Jac, b: Jac): Jac = {
    if (a.z.signum == 0) return b
    if (b.z.signum == 0) return a
    val z1z1 = a.z.multiply(a.z).mod(P)
    val z2z2 = b.z.multiply(b.z).mod(P)
    val u1   = a.x.multiply(z2z2).mod(P)
    val u2   = b.x.multiply(z1z1).mod(P)
    val s1   = a.y.multiply(z2z2).multiply(b.z).mod(P)
    val s2   = b.y.multiply(z1z1).multiply(a.z).mod(P)
    if (u1 == u2) {
      if (s1 == s2) return jDouble(a)
      return JacInf
    }
    val h  = u2.subtract(u1).mod(P)
    val i  = h.shiftLeft(1).modPow(Two, P)
    val j  = h.multiply(i).mod(P)
    val r  = s2.subtract(s1).shiftLeft(1).mod(P)
    val v  = u1.multiply(i).mod(P)
    val x3 = r.multiply(r).subtract(j).subtract(v.shiftLeft(1)).mod(P)
    val y3 = r.multiply(v.subtract(x3)).subtract(s1.multiply(j).shiftLeft(1)).mod(P)
    val z3 = a.z.add(b.z).modPow(Two, P).subtract(z1z1).subtract(z2z2).multiply(h).mod(P)
    Jac(x3, y3, z3)
  }

  def mul(p: Point, k: BigInteger): Point = {
    var acc = JacInf
    var add = toJac(p)
    var n   = k.mod(N)
    while (n.signum > 0) {
      if (n.testBit(0)) acc = jAdd(acc, add)
      add = jDouble(add)
      n = n.shiftRight(1)
    }
    fromJac(acc)
  }

  def add(a: Point, b: Point): Point = fromJac(jAdd(toJac(a), toJac(b)))

  /** Σ aG + bQ (Shamir would halve the doublings; clarity wins here). */
  private def sumOfTwoMul(a: BigInteger, b: BigInteger, q: Point): Point =
    add(mul(G, a), mul(q, b))

  def onCurve(p: Point): Boolean =
    !p.isInfinity &&
      p.y.multiply(p.y).mod(P) ==
        p.x.multiply(p.x).multiply(p.x).add(Seven).mod(P)

  /** Recover the public key from a signature: Q = r⁻¹·(s·R − z·G), with R
    * the curve point whose x is `r` (+N when recId ≥ 2) and whose y parity
    * is recId&1. Returns None for invalid (r, s, recId) combinations.
    */
  def recoverPublicKey(msgHash: Array[Byte], r: BigInteger, s: BigInteger,
                       recId: Int): Option[Point] = {
    if (recId < 0 || recId > 3) return None
    if (r.signum <= 0 || r.compareTo(N) >= 0) return None
    if (s.signum <= 0 || s.compareTo(N) >= 0) return None
    val x = if (recId >= 2) r.add(N) else r
    if (x.compareTo(P) >= 0) return None
    // y² = x³ + 7; p ≡ 3 (mod 4) → y = (x³+7)^((p+1)/4)
    val ySq = x.multiply(x).multiply(x).add(Seven).mod(P)
    val y0  = ySq.modPow(P.add(One).shiftRight(2), P)
    if (y0.multiply(y0).mod(P) != ySq) return None // x not on curve
    val y = if (y0.testBit(0) == ((recId & 1) == 1)) y0 else P.subtract(y0)
    val bigR = Point(x, y)
    if (mul(bigR, N) != Infinity) return None
    val z    = new BigInteger(1, msgHash)
    val rInv = r.modInverse(N)
    val q = sumOfTwoMul(
      z.negate().multiply(rInv).mod(N),
      s.multiply(rInv).mod(N),
      bigR)
    if (q.isInfinity || !onCurve(q)) None else Some(q)
  }

  /** Ethereum address: low 20 bytes of keccak256(X ‖ Y). */
  def pointToAddress(p: Point): Array[Byte] = {
    val out = new Array[Byte](64)
    copyPadded(p.x, out, 0)
    copyPadded(p.y, out, 32)
    java.util.Arrays.copyOfRange(Keccak256.hash(out), 12, 32)
  }

  private def copyPadded(v: BigInteger, out: Array[Byte], off: Int): Unit = {
    val raw  = v.toByteArray.dropWhile(_ == 0)
    System.arraycopy(raw, 0, out, off + 32 - raw.length, raw.length)
  }

  /** ECDSA sign with a caller-supplied nonce k — test-fixture use only
    * (production signing belongs to wallets, not an indexer). Returns
    * (r, s, recId).
    */
  def signWithK(msgHash: Array[Byte], privKey: BigInteger,
                k: BigInteger): (BigInteger, BigInteger, Int) = {
    val kg = mul(G, k)
    val r  = kg.x.mod(N)
    require(r.signum > 0, "bad k: r = 0")
    val z = new BigInteger(1, msgHash)
    var s = k.modInverse(N).multiply(z.add(r.multiply(privKey))).mod(N)
    require(s.signum > 0, "bad k: s = 0")
    var recId = (if (kg.y.testBit(0)) 1 else 0) + (if (kg.x.compareTo(N) >= 0) 2 else 0)
    // low-s normalization (what geth emits); flips the parity bit
    if (s.compareTo(N.shiftRight(1)) > 0) { s = N.subtract(s); recId ^= 1 }
    (r, s, recId)
  }
}
