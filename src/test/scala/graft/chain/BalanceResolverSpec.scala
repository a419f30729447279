package graft.chain

import org.apache.spark.util.LongAccumulator
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.chain.Fixtures._
import graft.chain.Schemas.Sentinels

/** S6–S8: the mapPartitions batched resolver against a fixture client —
  * chunked exactly like the reference's RPC batching
  * (client/balancer.go:43-116, ChunkSize=1000).
  */
/** Deterministic fixture client: balance = f(token, address); counts calls
  * and enforces the per-call batch cap like a real RPC would. Top-level so
  * serialization ships no test-suite \$outer.
  */
final case class FixtureBalanceClient(
    chunkCap: Int,
    calls: LongAccumulator) extends BalanceClient {
  override def balances(blockHash: Array[Byte],
                        pairs: Seq[(Array[Byte], Array[Byte])]): Seq[String] = {
    require(pairs.nonEmpty && pairs.length <= chunkCap,
      s"RPC batch of ${pairs.length} exceeds cap $chunkCap")
    calls.add(1)
    pairs.map { case (t, a) =>
      ((BigInt(1, t) + BigInt(1, a)) % BigInt(10).pow(30)).toString // stable, ≫ 2^63, ≤ ref domain
    }
  }
}

class BalanceResolverSpec extends SparkSpec {
  import spark.implicits._

  test("resolves every pair with <=1000-per-call batching, distributed") {
    val calls  = spark.sparkContext.longAccumulator("rpc-calls")
    val client = FixtureBalanceClient(1000, calls)
    val pairs = (1 to 2500).map(i => (Sentinels.EthToken, addr20(i)))
      .toDF("token", "address").repartition(2)
    val got = BalanceResolver.resolve(pairs, hash32(1), client, chunkSize = 1000)
    assert(got.count() == 2500)
    // 2 partitions × ceil(rows-per-partition / 1000) — at most 4, least 3
    assert(calls.value >= 3 && calls.value <= 4, s"calls = ${calls.value}")
    // values round-trip through Decimal(38,0) without the (38,18) clamp
    val one = got.filter(col("address") === lit(addr20(7))).head()
    val expect = (BigInt(1, Sentinels.EthToken) + BigInt(1, addr20(7))) % BigInt(10).pow(30)
    assert(one.getDecimal(2).toBigInteger == expect.bigInteger)
  }

  test("resolver output drives BalancePipeline identically to a fixture table") {
    val calls  = spark.sparkContext.longAccumulator("rpc-calls-2")
    val client = FixtureBalanceClient(1000, calls)
    val pairs  = Seq((Sentinels.EthToken, alice), (Sentinels.EthToken, bob))
      .toDF("token", "address")
    val resolved = BalanceResolver.resolve(pairs, hash32(10), client)
    val direct = Seq(
      (Sentinels.EthToken, alice, ((BigInt(1, Sentinels.EthToken) + BigInt(1, alice)) % BigInt(10).pow(30)).toString),
      (Sentinels.EthToken, bob, ((BigInt(1, Sentinels.EthToken) + BigInt(1, bob)) % BigInt(10).pow(30)).toString)
    ).toDF("token", "address", "balance")
      .select(col("token"), col("address"), col("balance").cast(Rewards.wei).as("balance"))

    val a = resolved.orderBy(hex(col("address"))).collect().map(_.toSeq.map {
      case b: Array[Byte] => b.toSeq; case x => x
    })
    val b = direct.orderBy(hex(col("address"))).collect().map(_.toSeq.map {
      case b: Array[Byte] => b.toSeq; case x => x
    })
    assert(a.toSeq == b.toSeq)
  }
}
