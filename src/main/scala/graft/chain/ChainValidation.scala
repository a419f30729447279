package graft.chain

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.chain.Schemas.Sentinels

/** A7 validation semantics: the reference rejects blocks whose uncle/miner
  * reward structure is malformed (model/types.go:44-51 ErrTooManyUncles /
  * ErrTooManyMiners / ErrConfusedUncles; enforcement at
  * model/types.go:93-99 and store/transfer_processor.go:195-215).
  *
  * Spark-first shape: violations are DATA (a DataFrame of offending
  * blocks), so at 100 TB the audit is one aggregation, not a driver loop;
  * `requireValid` is the strict gate that aborts a batch exactly like the
  * reference's error return.
  */
object ChainValidation {

  val MaxUncles = 2 // model/types.go:44

  /** Blocks carrying more than `maxUncles` uncles, or uncle refs whose
    * number is inconsistent with the block (uncle height must be within
    * [number−6, number−1] — a generation gap ≤ 6 per consensus; the
    * reference's ErrConfusedUncles guards array-shape consistency which a
    * columnar schema makes impossible by construction).
    */
  def invalidUncleBlocks(blocks: DataFrame, maxUncles: Int = MaxUncles): DataFrame =
    blocks.select(
      col("number"),
      size(col("uncles")).as("n_uncles"),
      exists(col("uncles"),
        u => u.getField("number") >= col("number") ||
          u.getField("number") < col("number") - 6).as("confused"))
      .filter(col("n_uncles") > maxUncles || col("confused"))

  /** Per-block reward-event cardinality violations
    * (transfer_processor.go:195-215): more than one distinct miner-reward
    * recipient, or more than MaxUncles distinct uncle-reward recipients.
    */
  def rewardEventViolations(transfers: DataFrame, maxUncles: Int = MaxUncles): DataFrame =
    transfers
      .filter(col("from") === lit(Sentinels.MinerReward) ||
        col("from") === lit(Sentinels.UncleReward))
      .groupBy("block_number")
      .agg(
        count_distinct(when(col("from") === lit(Sentinels.MinerReward), col("to")))
          .as("n_miner_recipients"),
        count_distinct(when(col("from") === lit(Sentinels.UncleReward), col("to")))
          .as("n_uncle_recipients"))
      .filter(col("n_miner_recipients") > 1 || col("n_uncle_recipients") > maxUncles)

  /** Parent-linkage audit — the reference's post-insert consistency check
    * (store/store.go:149-172, ErrModifiedData: a concurrent writer broke
    * the chain). Heights whose parent_hash does not match the stored hash
    * one below, as a single self-join on number (shuffle on the join key;
    * at 100 TB restrict to a recent-number window first).
    */
  def brokenParentLinks(headers: DataFrame): DataFrame =
    headers.as("c")
      .join(headers.as("p"), col("c.number") === col("p.number") + lit(1L))
      .filter(col("c.parent_hash") =!= col("p.hash"))
      .select(col("c.number").as("number"),
        col("c.parent_hash").as("parent_hash"),
        col("p.hash").as("stored_parent_hash"))

  /** Strict gate: throw on the first violation, like the reference's batch
    * abort. Checks are limit(1) probes — no full materialization on the
    * happy path.
    */
  def requireValid(blocks: DataFrame, transfers: DataFrame,
                   maxUncles: Int = MaxUncles): Unit = {
    val badBlock = invalidUncleBlocks(blocks, maxUncles).limit(1).collect()
    if (badBlock.nonEmpty) {
      val r = badBlock(0)
      throw new IllegalStateException(
        if (r.getAs[Boolean]("confused")) s"confused uncles at block ${r.getLong(0)}"
        else s"too many uncles at block ${r.getLong(0)}: ${r.getInt(1)}")
    }
    val badReward = rewardEventViolations(transfers, maxUncles).limit(1).collect()
    if (badReward.nonEmpty) {
      val r = badReward(0)
      throw new IllegalStateException(
        if (r.getLong(1) > 1) s"too many miners at block ${r.getLong(0)}"
        else s"too many uncles at block ${r.getLong(0)}")
    }
  }
}
