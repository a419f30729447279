package graft.functions

/** Keccak-256 (the pre-NIST padding variant Ethereum uses — pad byte 0x01,
  * not SHA-3's 0x06), implemented directly from the Keccak-f[1600] sponge
  * specification. Pure JVM, no dependencies: used by signer recovery
  * (ref common/utils.go:120-127 via geth types.Sender) and event-signature
  * constants (ref store/event_erc20.go:32-35).
  */
object Keccak256 {

  private val RC: Array[Long] = Array(
    0x0000000000000001L, 0x0000000000008082L, 0x800000000000808aL, 0x8000000080008000L,
    0x000000000000808bL, 0x0000000080000001L, 0x8000000080008081L, 0x8000000000008009L,
    0x000000000000008aL, 0x0000000000000088L, 0x0000000080008009L, 0x000000008000000aL,
    0x000000008000808bL, 0x800000000000008bL, 0x8000000000008089L, 0x8000000000008003L,
    0x8000000000008002L, 0x8000000000000080L, 0x000000000000800aL, 0x800000008000000aL,
    0x8000000080008081L, 0x8000000000008080L, 0x0000000080000001L, 0x8000000080008008L)

  /** Rotation offsets r[x][y]. */
  private val R: Array[Array[Int]] = Array(
    Array(0, 36, 3, 41, 18),
    Array(1, 44, 10, 45, 2),
    Array(62, 6, 43, 15, 61),
    Array(28, 55, 25, 21, 56),
    Array(27, 20, 39, 8, 14))

  private val Rate = 136 // bytes: 1600 − 2·256 bits

  def hash(input: Array[Byte]): Array[Byte] = {
    // multi-rate padding 0x01 … 0x80 (may collapse to a single 0x81 byte)
    val padLen = Rate - (input.length % Rate)
    val padded = java.util.Arrays.copyOf(input, input.length + padLen)
    padded(input.length) = (padded(input.length) | 0x01).toByte
    padded(padded.length - 1) = (padded(padded.length - 1) | 0x80).toByte

    val a = Array.ofDim[Long](5, 5)
    var off = 0
    while (off < padded.length) {
      var i = 0
      while (i < Rate / 8) {
        a(i % 5)(i / 5) ^= leLong(padded, off + i * 8)
        i += 1
      }
      keccakF(a)
      off += Rate
    }
    val out = new Array[Byte](32)
    var i = 0
    while (i < 4) { // 32 bytes = 4 lanes
      putLeLong(out, i * 8, a(i % 5)(i / 5))
      i += 1
    }
    out
  }

  def hash(s: String): Array[Byte] = hash(s.getBytes("UTF-8"))

  private def leLong(b: Array[Byte], off: Int): Long = {
    var v = 0L
    var i = 7
    while (i >= 0) { v = (v << 8) | (b(off + i) & 0xffL); i -= 1 }
    v
  }

  private def putLeLong(b: Array[Byte], off: Int, v: Long): Unit = {
    var i = 0
    while (i < 8) { b(off + i) = ((v >>> (8 * i)) & 0xff).toByte; i += 1 }
  }

  private def keccakF(a: Array[Array[Long]]): Unit = {
    val c = new Array[Long](5)
    val d = new Array[Long](5)
    val b = Array.ofDim[Long](5, 5)
    var round = 0
    while (round < 24) {
      // θ
      var x = 0
      while (x < 5) {
        c(x) = a(x)(0) ^ a(x)(1) ^ a(x)(2) ^ a(x)(3) ^ a(x)(4); x += 1
      }
      x = 0
      while (x < 5) {
        d(x) = c((x + 4) % 5) ^ java.lang.Long.rotateLeft(c((x + 1) % 5), 1)
        var y = 0
        while (y < 5) { a(x)(y) ^= d(x); y += 1 }
        x += 1
      }
      // ρ + π
      x = 0
      while (x < 5) {
        var y = 0
        while (y < 5) {
          b(y)((2 * x + 3 * y) % 5) = java.lang.Long.rotateLeft(a(x)(y), R(x)(y))
          y += 1
        }
        x += 1
      }
      // χ
      x = 0
      while (x < 5) {
        var y = 0
        while (y < 5) {
          a(x)(y) = b(x)(y) ^ (~b((x + 1) % 5)(y) & b((x + 2) % 5)(y))
          y += 1
        }
        x += 1
      }
      // ι
      a(0)(0) ^= RC(round)
      round += 1
    }
  }
}
