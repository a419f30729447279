package graft.chain

import graft.SparkSpec
import graft.chain.Fixtures._
import graft.chain.Schemas._

/** Fixture metadata client: deterministic values per address; top-level so
  * serialization ships no test-suite \$outer.
  */
final case class FixtureMetadataClient(failSupplyFor: Seq[Byte]) extends TokenMetadataClient {
  override def metadata(addresses: Seq[Array[Byte]]): Seq[(Option[String], Int, String)] =
    addresses.map { a =>
      if (a.toSeq == failSupplyFor) (None, 0, "")
      else (Some((BigInt(1, a) % BigInt(10).pow(30)).toString), 18, s"TOK${a(0) & 0xff}")
    }
}

class ValidationAndMetadataSpec extends SparkSpec {
  import spark.implicits._

  test("A7: >2 uncles and inconsistent uncle numbers are flagged") {
    val ok   = block(100L, hash32(99), uncles = Seq(UncleRef(hash32(1), uncleA, 99L)))
    val many = block(101L, hash32(100), uncles = (1 to 3).map(i => UncleRef(hash32(i), uncleA, 100L)))
    val conf = block(102L, hash32(101), uncles = Seq(UncleRef(hash32(5), uncleA, 102L))) // uncle at own height
    val df   = Seq(ok, many, conf).toDS().toDF()

    val bad = ChainValidation.invalidUncleBlocks(df).collect()
      .map(r => r.getLong(0) -> r.getAs[Boolean]("confused")).toMap
    assert(bad.keySet == Set(101L, 102L))
    assert(!bad(101L) && bad(102L))

    intercept[IllegalStateException] {
      ChainValidation.requireValid(df, spark.emptyDataFrame
        .select()) // transfers unused before first throw
    }
  }

  test("A7: reward-event cardinality violations per block") {
    val eth = Sentinels.EthToken
    val transfers = Seq(
      // block 1: one miner, two uncles — fine
      (eth, Sentinels.MinerReward, miner, "1", 1L),
      (eth, Sentinels.UncleReward, uncleA, "2", 1L),
      (eth, Sentinels.UncleReward, alice, "3", 1L),
      // block 2: two distinct miner recipients — ErrTooManyMiners
      (eth, Sentinels.MinerReward, miner, "1", 2L),
      (eth, Sentinels.MinerReward, alice, "1", 2L),
      // block 3: three distinct uncle recipients — ErrTooManyUncles
      (eth, Sentinels.UncleReward, miner, "1", 3L),
      (eth, Sentinels.UncleReward, alice, "1", 3L),
      (eth, Sentinels.UncleReward, bob, "1", 3L)
    ).toDF("token", "from", "to", "value", "block_number")

    val bad = ChainValidation.rewardEventViolations(transfers).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(bad.keySet == Set(2L, 3L))
    assert(bad(2L)._1 == 2L) // miners
    assert(bad(3L)._2 == 3L) // uncle recipients
  }

  test("parent-linkage audit flags a broken chain (ErrModifiedData)") {
    val headers = Seq(
      (1L, hash32(1), hash32(0)),
      (2L, hash32(2), hash32(1)),
      (3L, hash32(3), hash32(99)) // parent mismatch: points at a foreign hash
    ).toDF("number", "hash", "parent_hash")
    val bad = ChainValidation.brokenParentLinks(headers).collect()
    assert(bad.length == 1 && bad(0).getLong(0) == 3L)
    assert(bad(0).getAs[Array[Byte]]("stored_parent_hash").toSeq == hash32(2).toSeq)
  }

  test("S9: metadata resolves distributed with warn-and-default semantics") {
    val failing = addr20(9)
    val client  = FixtureMetadataClient(failing.toSeq)
    val tokens  = (1 to 10).map(i => Tuple1(addr20(i))).toDF("address")
    val got = TokenMetadata.resolve(tokens, 77L, client, chunkSize = 4).collect()
      .map(r => r.getAs[Array[Byte]]("address").toSeq ->
        (Option(r.getDecimal(2)), r.getInt(3), r.getString(4))).toMap

    assert(got.size == 10)
    assert(got(failing.toSeq)._1.isEmpty) // required totalSupply failed → null row value
    val okAddr = addr20(3)
    assert(got(okAddr.toSeq)._1.get.toBigInteger ==
      ((BigInt(1, okAddr) % BigInt(10).pow(30)).bigInteger))
    assert(got(okAddr.toSeq)._2 == 18)
    assert(got.values.forall(_._3.startsWith("TOK") || got(failing.toSeq)._3 == ""))
  }
}
