package graft.functions

import java.math.BigInteger
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Column-level chain functions (the `graft.functions` package referenced
  * from Transforms): F9 signer recovery and keccak256.
  *
  * Signer recovery mirrors the reference's tx conversion
  * (common/utils.go:120-127: `types.MakeSigner(chain, blockNumber)` +
  * `tx.AsMessage(signer)`). The reference picks the signer by chain config
  * and block height; the signature's own `v` encodes the same information
  * (EIP-155: v = 2·chainId + 35 + parity; legacy: v = 27 + parity), so the
  * self-contained form needs no chain-config argument.
  */
object ChainFunctions {

  /** EIP-155 / legacy signing hash for a transaction's raw fields. */
  def signingHash(
      nonce: Long,
      gasPrice: BigInteger,
      gasLimit: Long,
      to: Array[Byte], // null = contract creation
      value: BigInteger,
      payload: Array[Byte],
      chainId: Long): Array[Byte] = {
    val base = Seq(
      Rlp.fromLong(nonce),
      Rlp.fromBigInteger(gasPrice),
      Rlp.fromLong(gasLimit),
      Rlp.Bytes(if (to == null) Array.emptyByteArray else to),
      Rlp.fromBigInteger(value),
      Rlp.Bytes(if (payload == null) Array.emptyByteArray else payload))
    val items =
      if (chainId > 0)
        base ++ Seq(Rlp.fromLong(chainId), Rlp.fromLong(0L), Rlp.fromLong(0L))
      else base
    Keccak256.hash(Rlp.encode(Rlp.Items(items)))
  }

  /** Recover the sender address from raw tx fields + signature. Returns
    * null (→ SQL NULL) for invalid signatures, like the reference's
    * ErrWrongSigner path.
    */
  def recoverSignerAddress(
      nonce: Long,
      gasPrice: BigInteger,
      gasLimit: Long,
      to: Array[Byte],
      value: BigInteger,
      payload: Array[Byte],
      v: Long,
      r: Array[Byte],
      s: Array[Byte]): Array[Byte] = {
    val (chainId, parity) =
      if (v >= 35) ((v - 35) / 2, ((v - 35) % 2).toInt)
      else if (v == 27 || v == 28) (0L, (v - 27).toInt)
      else return null
    val hash = signingHash(nonce, gasPrice, gasLimit, to, value, payload, chainId)
    Secp256k1
      .recoverPublicKey(hash, new BigInteger(1, r), new BigInteger(1, s), parity)
      .map(Secp256k1.pointToAddress)
      .orNull
  }

  private val recoverUdf = udf {
    (nonce: Long, gasPrice: Long, gasLimit: Long, to: Array[Byte],
     amount: String, payload: Array[Byte], v: Long, r: Array[Byte], s: Array[Byte]) =>
      recoverSignerAddress(nonce, BigInteger.valueOf(gasPrice), gasLimit, to,
        if (amount == null || amount.isEmpty) BigInteger.ZERO else new BigInteger(amount),
        payload, v, r, s)
  }

  /** F9 as a column: sender address (20 bytes) or NULL. `amount` is the
    * decimal wei string of Schemas.Tx.
    */
  def recoverSigner(
      nonce: Column, gasPrice: Column, gasLimit: Column, to: Column,
      amount: Column, payload: Column, v: Column, r: Column, s: Column): Column =
    recoverUdf(nonce, gasPrice, gasLimit, to, amount, payload, v, r, s)

  private val keccakUdf = udf((b: Array[Byte]) =>
    if (b == null) null else Keccak256.hash(b))

  /** keccak256 over a binary column (topics/event-signature hashing). */
  def keccak256(c: Column): Column = keccakUdf(c)
}
