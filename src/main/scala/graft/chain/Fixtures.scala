package graft.chain

import java.sql.Timestamp
import graft.chain.Schemas._

/** Deterministic domain fixtures mirroring the reference's test blocks
  * (store/store_test.go:45-58, transfer_processor_test.go fixtures) —
  * synthetic hashes/addresses, real reward/TD math expected downstream.
  * Main-scope because both the specs AND the ingest benchmark
  * ([[graft.IngestBench]]) generate their synthetic chains here.
  */
object Fixtures {

  def hash32(seed: Int): Array[Byte] = {
    val b = new Array[Byte](32)
    var i = 0
    while (i < 32) { b(i) = ((seed * 31 + i * 7 + 3) & 0xff).toByte; i += 1 }
    b
  }

  def addr20(seed: Int): Array[Byte] = {
    val b = new Array[Byte](20)
    var i = 0
    while (i < 20) { b(i) = ((seed * 17 + i * 13 + 1) & 0xff).toByte; i += 1 }
    b
  }

  def nonce8(v: Long): Array[Byte] =
    java.nio.ByteBuffer.allocate(8).putLong(v).array()

  /** 32-byte big-endian uint256 payload for a value. */
  def uint256(v: BigInt): Array[Byte] = {
    val raw = v.toByteArray.dropWhile(_ == 0)
    val out = new Array[Byte](32)
    System.arraycopy(raw, 0, out, 32 - raw.length, raw.length)
    out
  }

  /** Address widened to a 32-byte topic (high 12 bytes zero). */
  def addrTopic(addr: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](32)
    System.arraycopy(addr, 0, out, 12, 20)
    out
  }

  val miner: Array[Byte]   = addr20(100)
  val uncleA: Array[Byte]  = addr20(101)
  val alice: Array[Byte]   = addr20(1)
  val bob: Array[Byte]     = addr20(2)
  val carol: Array[Byte]   = addr20(3)
  val tokenX: Array[Byte]  = addr20(200)

  def tx(seed: Int, from: Array[Byte], to: Array[Byte], amount: BigInt,
         gasPrice: Long = 100L, gasLimit: Long = 21000L): Tx =
    Tx(hash32(1000 + seed), from, Option(to), seed.toLong, gasPrice, gasLimit,
      amount.toString, Array.emptyByteArray)

  def block(number: Long, parent: Array[Byte], txs: Seq[Tx] = Nil,
            uncles: Seq[UncleRef] = Nil, difficulty: Long = 1000L,
            hashSeed: Int = -1): Block = {
    val h = hash32(if (hashSeed >= 0) hashSeed else number.toInt)
    Block(number, h, parent, hash32(5000 + number.toInt), miner,
      hash32(6000 + number.toInt), hash32(7000 + number.toInt), hash32(8000 + number.toInt),
      difficulty, 8000000L, txs.map(_.gasLimit).sum, 1500000000L + number,
      Array.emptyByteArray, hash32(9000 + number.toInt), nonce8(number),
      txs, uncles)
  }

  /** An ERC20 Transfer log for tokenX. */
  def transferLog(from: Array[Byte], to: Array[Byte], value: BigInt): LogEntry =
    LogEntry(tokenX,
      Seq(Sentinels.TransferSig, addrTopic(from), addrTopic(to)),
      uint256(value))

  def receipt(t: Tx, blockNumber: Long, gasUsed: Long = 21000L,
              logs: Seq[LogEntry] = Nil): Receipt =
    Receipt(None, 1, gasUsed, gasUsed, new Array[Byte](256), t.hash, None, blockNumber, logs)

  def sub(id: Long, group: Long, address: Array[Byte], blockNumber: Long = 1L): Subscription =
    Subscription(id, blockNumber, group, address,
      new Timestamp(0L), new Timestamp(0L))

  /** Linked chain of bundles [start, end] chaining parent hashes — the
    * shared generator for the ingest/streaming specs. Optional txs per
    * height (with matching receipts), optionally mirrored as eth transfer
    * logs so the balance pipeline sees deltas.
    */
  def bundleChain(start: Long, end: Long, parent: Array[Byte],
                  difficulty: Long = 1000L, hashSeedBase: Int = -1,
                  txsAt: Map[Long, Seq[Tx]] = Map.empty,
                  withTransferLogs: Boolean = false): Seq[Bundle] = {
    var p = parent
    (start to end).map { n =>
      val seed = if (hashSeedBase >= 0) hashSeedBase + n.toInt else n.toInt
      val txs  = txsAt.getOrElse(n, Nil)
      val b    = block(n, p, txs = txs, difficulty = difficulty, hashSeed = seed)
      p = b.hash
      val logs = if (withTransferLogs)
        txs.map(t => TransferLog(t.hash, t.from, t.to.get, t.amount, n)) else Nil
      Bundle(b, txs.map(receipt(_, n)), logs)
    }
  }

}
