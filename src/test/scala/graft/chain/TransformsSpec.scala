package graft.chain

import graft.SparkSpec
import graft.chain.Fixtures._
import graft.chain.Schemas._
import org.apache.spark.sql.functions._

class TransformsSpec extends SparkSpec {
  import spark.implicits._

  private def bd(s: String) = new java.math.BigDecimal(s)

  test("blockHeaders computes era-correct miner and uncle rewards (A7)") {
    val uncle = UncleRef(hash32(55), uncleA, 6L)
    val blocks = Seq(
      block(7L, hash32(6), uncles = Seq(uncle)),              // frontier, 1 uncle
      block(4370001L, hash32(1)),                              // byzantium
      block(7280001L, hash32(2))                               // constantinople
    ).toDS().toDF()

    val got = Transforms.blockHeaders(blocks)
      .select("number", "miner_reward", "uncles_reward")
      .collect().map(r => r.getLong(0) -> (r.getDecimal(1), r.getDecimal(2))).toMap

    // frontier: base 5e18 + 1 uncle inclusion 5e18/32; uncle (6+8-7)*5e18/8
    assert(got(7L)._1.compareTo(bd("5156250000000000000")) == 0)
    assert(got(7L)._2.compareTo(bd("4375000000000000000")) == 0)
    assert(got(4370001L)._1.compareTo(bd("3000000000000000000")) == 0)
    assert(got(7280001L)._1.compareTo(bd("2000000000000000000")) == 0)
    assert(got(7280001L)._2.signum == 0)
  }

  test("transactions explodes the nested array into flat rows (P12)") {
    val b = block(1L, hash32(0), txs = Seq(tx(1, alice, bob, 500), tx(2, bob, carol, 700)))
    val got = Transforms.transactions(Seq(b).toDS().toDF())
    assert(got.count() == 2)
    val r = got.filter(col("nonce") === 1L).head()
    assert(r.getAs[Array[Byte]]("from").toSeq == alice.toSeq)
    assert(r.getAs[java.math.BigDecimal]("amount").compareTo(bd("500")) == 0)
    assert(r.getAs[Long]("block_number") == 1L)
  }

  test("receiptLogs splits topics with NA default (F6)") {
    val t1   = tx(1, alice, bob, 500)
    val logA = transferLog(alice, bob, BigInt(123))
    val logB = LogEntry(tokenX, Nil, Array.emptyByteArray) // no topics
    val rcpt = receipt(t1, 1L, logs = Seq(logA, logB))
    val got = Transforms.receiptLogs(Seq(rcpt).toDS().toDF()).orderBy("log_index").collect()
    assert(got.length == 2)
    assert(got(0).getAs[String]("event_name") ==
      Sentinels.TransferSig.map("%02x".format(_)).mkString)
    assert(got(0).getAs[Array[Byte]]("topic1").toSeq == addrTopic(alice).toSeq)
    assert(got(1).getAs[String]("event_name") == "NA")
    assert(got(1).isNullAt(got(1).fieldIndex("topic1")))
  }

  test("erc20Transfers decodes registered-token Transfer logs (J3/F7/F8)") {
    val t1 = tx(1, alice, bob, 0)
    val rcpts = Seq(
      receipt(t1, 1L, logs = Seq(
        transferLog(alice, bob, BigInt("123456789012345678901234567890")), // tokenX: kept
        LogEntry(addr20(201), Seq(Sentinels.TransferSig, addrTopic(alice), addrTopic(bob)),
          uint256(BigInt(5))) // unregistered token: dropped
      ))).toDS().toDF()
    val logs   = Transforms.receiptLogs(rcpts)
    val tokens = Seq((tokenX, 1L)).toDF("address", "block_number")
    val got    = Transforms.erc20Transfers(logs, tokens).collect()
    assert(got.length == 1)
    assert(got(0).getAs[Array[Byte]]("from").toSeq == alice.toSeq)
    assert(got(0).getAs[Array[Byte]]("to").toSeq == bob.toSeq)
    assert(got(0).getAs[java.math.BigDecimal]("value")
      .compareTo(bd("123456789012345678901234567890")) == 0)
  }

  test("totalDifficulty accumulates parent TD (A6/W2)") {
    val blocks = Seq(
      block(1L, hash32(0), difficulty = 100L),
      block(2L, hash32(1), difficulty = 250L),
      block(3L, hash32(2), difficulty = 50L)).toDS().toDF()
    val got = Transforms.totalDifficulty(Transforms.blockHeaders(blocks))
      .orderBy("block").select("td").collect().map(_.getDecimal(0).longValue()).toSeq
    assert(got == Seq(100L, 350L, 400L))
  }

  test("totalDifficulty two-level scan: range-partitioned, same result at any width") {
    val headers = Transforms.blockHeaders(
      (1L to 20L).map(n => block(n, hash32(n.toInt - 1), difficulty = 100L + n)).toDS().toDF())
    val naive = (1L to 20L).scanLeft(0L)((acc, n) => acc + 100L + n).drop(1)
    Seq(3L, 7L, 100000L).foreach { width =>
      val got = Transforms.totalDifficulty(headers, rangeWidth = width)
        .orderBy("block").select("td").collect().map(_.getDecimal(0).longValue()).toSeq
      assert(got == naive, s"rangeWidth=$width")
    }
    // plan contract: history flows through a __r-partitioned window; only
    // the per-range offsets relation may cross a single-partition exchange
    val plan = Transforms.totalDifficulty(headers, rangeWidth = 3L)
      .queryExecution.executedPlan.toString
    assert(plan.linesIterator.count(_.contains("Exchange SinglePartition")) <= 1,
      s"full history must not funnel through one task:\n$plan")
  }

  test("rewardTransfers synthesizes sentinel miner/uncle rows (U1/F10)") {
    val b = block(7L, hash32(6), uncles = Seq(UncleRef(hash32(55), uncleA, 6L)))
    val got = Transforms.rewardTransfers(Seq(b).toDS().toDF()).collect()
    assert(got.length == 2)
    val miners = got.filter(_.getAs[Array[Byte]]("from").toSeq == Sentinels.MinerReward.toSeq)
    val uncles = got.filter(_.getAs[Array[Byte]]("from").toSeq == Sentinels.UncleReward.toSeq)
    assert(miners.length == 1 && uncles.length == 1)
    assert(miners(0).getAs[Array[Byte]]("to").toSeq == miner.toSeq)
    assert(uncles(0).getAs[Array[Byte]]("to").toSeq == uncleA.toSeq)
    assert(uncles(0).getAs[java.math.BigDecimal]("value")
      .compareTo(bd("4375000000000000000")) == 0)
  }
}
