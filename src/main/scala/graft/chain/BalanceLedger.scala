package graft.chain

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Compact running state for the balance pipeline: one row per
  * (token, address) and per (group, token). The reference holds the same
  * state as its MySQL "latest row ≤ N" queries
  * (store/account/account.go:63-64, store/subscription/subscription.go:61);
  * a naive Spark translation re-windows ALL history each block — quadratic
  * over the chain's lifetime. The ledger upserts only the block's touched
  * keys, so a per-block step is O(touched + state), never O(history).
  *
  * State tables are small relative to history (≤ one row per subscribed
  * address / group-token) and persist fine through TableStore.replace (or
  * checkpointed parquet) between batches.
  */
object BalanceLedger {

  final case class State(latestAccounts: DataFrame, latestTotals: DataFrame)

  def empty(spark: org.apache.spark.sql.SparkSession): State = {
    import org.apache.spark.sql.types._
    val accSchema = StructType(Seq(
      StructField("token", BinaryType), StructField("address", BinaryType),
      StructField("block_number", LongType), StructField("balance", Rewards.wei)))
    val totSchema = StructType(Seq(
      StructField("block_number", LongType), StructField("token", BinaryType),
      StructField("group", LongType), StructField("balance", Rewards.wei),
      StructField("tx_fee", Rewards.wei), StructField("miner_reward", Rewards.wei),
      StructField("uncles_reward", Rewards.wei)))
    def emptyDf(s: StructType) =
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], s)
    State(emptyDf(accSchema), emptyDf(totSchema))
  }

  /** Keyed upsert: rows of `prev` not superseded by `updates`, plus
    * `updates`. Both sides keep the same schema; the result stays one row
    * per key.
    */
  def upsert(prev: DataFrame, updates: DataFrame, keys: Seq[String]): DataFrame =
    prev.join(updates.select(keys.map(col): _*).distinct(), keys, "left_anti")
      .unionByName(updates)

  /** One block step: run the pipeline against compact state, then fold the
    * new snapshots/totals back into it.
    */
  def step(state: State, in: BalancePipeline.Inputs,
           newSubLimit: Int = 990): (BalancePipeline.Outputs, State) = {
    val out = BalancePipeline.process(
      in.copy(accounts = state.latestAccounts, prevTotals = state.latestTotals),
      newSubLimit, compactInputs = true)
    val accCols = Seq("token", "address", "block_number", "balance")
    val next = State(
      latestAccounts = upsert(
        state.latestAccounts,
        out.newAccounts.select(accCols.map(col): _*),
        Seq("token", "address")),
      latestTotals = upsert(
        state.latestTotals,
        out.totalBalances,
        Seq("group", "token")))
    (out, next)
  }
}
