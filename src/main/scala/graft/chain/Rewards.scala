package graft.chain

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Block reward schedule (common/utils.go:216-254 in /root/reference) as
  * pure column arithmetic — when/otherwise on fork boundaries, no UDF, so
  * the whole computation stays inside whole-stage codegen.
  *
  * Wei amounts use Decimal(38,0): the largest value here is
  * 5e18·(uncle factors) ≪ 10^38.
  */
object Rewards {
  val wei: DecimalType = DecimalType(38, 0)

  // Mainnet fork heights (common/chain.go:39-50)
  val ByzantiumBlock: Long      = 4370000L
  val ConstantinopleBlock: Long = 7280000L

  val FrontierReward: java.math.BigDecimal       = new java.math.BigDecimal("5000000000000000000")
  val ByzantiumReward: java.math.BigDecimal      = new java.math.BigDecimal("3000000000000000000")
  val ConstantinopleReward: java.math.BigDecimal = new java.math.BigDecimal("2000000000000000000")

  /** Base miner reward for a block number (common/utils.go:224-235). */
  def baseReward(blockNumber: Column): Column =
    when(blockNumber >= ConstantinopleBlock, lit(ConstantinopleReward).cast(wei))
      .when(blockNumber >= ByzantiumBlock, lit(ByzantiumReward).cast(wei))
      .otherwise(lit(FrontierReward).cast(wei))

  /** Per-uncle reward: (uncleNumber + 8 − blockNumber) · base / 8
    * (common/utils.go:243-248).
    */
  def uncleReward(blockNumber: Column, uncleNumber: Column): Column =
    ((uncleNumber + lit(8L) - blockNumber).cast(wei) * baseReward(blockNumber) / lit(8).cast(wei))
      .cast(wei)

  /** Miner's inclusion bonus per uncle: base / 32 (common/utils.go:249-252). */
  def uncleInclusionReward(blockNumber: Column): Column =
    (baseReward(blockNumber) / lit(32).cast(wei)).cast(wei)

  /** Total miner reward for a block: base + inclusion·nUncles. */
  def minerReward(blockNumber: Column, nUncles: Column): Column =
    (baseReward(blockNumber) + uncleInclusionReward(blockNumber) * nUncles.cast(wei)).cast(wei)
}
