package graft.chain

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** S9 — ERC20 metadata resolution (ref client/client.go:112-148 GetERC20:
  * `totalSupply()` required, `decimals()`/`name()` optional with warn-and-
  * default). Same seam pattern as BalanceResolver: a Serializable client
  * shipped to executors, one batched call per partition chunk, output rows
  * shaped like the erc20 registry table (model/types.go:238-244).
  */
trait TokenMetadataClient extends Serializable {

  /** Metadata per token address, aligned with the input order:
    * (totalSupply decimal string or None on failure, decimals, name).
    * Optional-method failures surface as defaults (0, ""), mirroring the
    * reference's warn-and-continue.
    */
  def metadata(addresses: Seq[Array[Byte]]): Seq[(Option[String], Int, String)]
}

object TokenMetadata {

  /** Resolve registry rows for `tokens` (column `address`: binary) at
    * `blockNumber`. Distributed: each partition drains its addresses in
    * ≤ chunkSize calls; nothing reaches the driver.
    */
  def resolve(
      tokens: DataFrame,
      blockNumber: Long,
      client: TokenMetadataClient,
      chunkSize: Int = 100): DataFrame = {
    val spark = tokens.sparkSession
    import spark.implicits._
    tokens.select(col("address")).as[Array[Byte]]
      .mapPartitions { it =>
        it.grouped(chunkSize).flatMap { chunk =>
          val got = client.metadata(chunk)
          require(got.length == chunk.length,
            s"client returned ${got.length} metadata rows for ${chunk.length} tokens")
          chunk.iterator.zip(got.iterator).map { case (addr, (supply, decimals, name)) =>
            (addr, supply, decimals, name)
          }
        }
      }
      .toDF("address", "total_supply", "decimals", "name")
      .select(
        col("address"),
        lit(blockNumber).as("block_number"),
        col("total_supply").cast(Rewards.wei).as("total_supply"),
        col("decimals"),
        col("name"))
  }
}
