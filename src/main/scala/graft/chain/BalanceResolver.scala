package graft.chain

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pluggable batched balance client — the seam over the reference's RPC
  * surface (client/client.go:156-225: `BatchBalanceAt` for ETH,
  * `BatchCallContract`+ABI for ERC20 `balanceOf`; combined resolver
  * `client/balancer.go:43-116`). Implementations are shipped to executors
  * (must be Serializable) and receive ≤ chunkSize pairs per call — the
  * reference's `ChunkSize = 1000` RPC batching (balancer.go:31-33,96-114).
  */
trait BalanceClient extends Serializable {

  /** Wei balances (decimal strings) at `blockHash` for (token, address)
    * pairs, aligned with the input order. token = Sentinels.EthToken means
    * the native-ETH batch; anything else is an ERC20 balanceOf call.
    */
  def balances(blockHash: Array[Byte],
               pairs: Seq[(Array[Byte], Array[Byte])]): Seq[String]
}

/** S6–S8: distributed batched balance resolution. The (token, address)
  * request set stays a DataFrame end-to-end; each partition drains its rows
  * in ≤ chunkSize groups through one client instance — RPC fan-out scales
  * with partitions, per-call batching matches the reference, and nothing
  * is collected to the driver.
  */
object BalanceResolver {

  val DefaultChunkSize = 1000 // client/balancer.go:31-33

  /** Resolve balances for `pairs` (token binary, address binary) at one
    * block. Output schema: (token, address, balance Decimal(38,0)) — the
    * resolver input shape of BalancePipeline.
    */
  def resolve(
      pairs: DataFrame,
      blockHash: Array[Byte],
      client: BalanceClient,
      chunkSize: Int = DefaultChunkSize): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    pairs.select(col("token"), col("address"))
      .as[(Array[Byte], Array[Byte])]
      .mapPartitions { it =>
        it.grouped(chunkSize).flatMap { chunk =>
          val got = client.balances(blockHash, chunk)
          require(got.length == chunk.length,
            s"client returned ${got.length} balances for ${chunk.length} requests")
          chunk.iterator.zip(got.iterator).map { case ((t, a), b) => (t, a, b) }
        }
      }
      .toDF("token", "address", "balance")
      .select(col("token"), col("address"),
        col("balance").cast(Rewards.wei).as("balance"))
  }

  /** Resolve balances for (token, address, block_number, hash) rows
    * spanning MANY blocks in one distributed pass — the vectorized form of
    * [[resolve]] for catch-up spans. Rows sort within each partition by
    * block, so every client call still carries pairs of a single block
    * hash (the reference's per-block `BatchBalanceAt` batching,
    * client/balancer.go:96-114) while the span's whole request set fans
    * out across partitions. Output: (token, address, block_number,
    * balance Decimal(38,0)).
    */
  def resolveAt(
      triples: DataFrame,
      client: BalanceClient,
      chunkSize: Int = DefaultChunkSize): DataFrame = {
    val spark = triples.sparkSession
    import spark.implicits._
    triples.select(col("token"), col("address"), col("block_number"), col("hash"))
      .sortWithinPartitions("block_number") // spillable sort, not an in-memory buffer
      .as[(Array[Byte], Array[Byte], Long, Array[Byte])]
      .mapPartitions { it0 =>
        val it = it0.buffered
        new Iterator[Seq[(Array[Byte], Array[Byte], Long, String)]] {
          def hasNext: Boolean = it.hasNext
          def next(): Seq[(Array[Byte], Array[Byte], Long, String)] = {
            val block = it.head._3
            val hash  = it.head._4
            val chunk = scala.collection.mutable.ArrayBuffer
              .empty[(Array[Byte], Array[Byte], Long, Array[Byte])]
            while (it.hasNext && it.head._3 == block && chunk.length < chunkSize)
              chunk += it.next()
            val got = client.balances(hash, chunk.map(r => (r._1, r._2)).toSeq)
            require(got.length == chunk.length,
              s"client returned ${got.length} balances for ${chunk.length} requests")
            chunk.iterator.zip(got.iterator)
              .map { case ((t, a, n, _), b) => (t, a, n, b) }.toSeq
          }
        }.flatMap(_.iterator)
      }
      .toDF("token", "address", "block_number", "balance")
      .select(col("token"), col("address"), col("block_number"),
        col("balance").cast(Rewards.wei).as("balance"))
  }
}
