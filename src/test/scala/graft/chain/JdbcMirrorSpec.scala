package graft.chain

import graft.SparkSpec
import graft.chain.Fixtures._
import org.apache.spark.sql.functions._

/** The JDBC mirror against embedded Derby: append, range retraction, and
  * the wei-as-varchar round trip (the reference's own storage choice).
  */
class JdbcMirrorSpec extends SparkSpec {
  import spark.implicits._

  private def freshDb(): JdbcMirror =
    JdbcMirror(spark, s"jdbc:derby:memory:graft${System.nanoTime()};create=true")

  test("append + read round-trips rows, wei decimals as varchar") {
    val db = freshDb()
    val big = "123456789012345678901234567890123456" // 36 digits > Derby's 31
    val txs = Seq(
      (1L, "a1", big),
      (2L, "a2", "500")
    ).toDF("block_number", "tag", "amount")
      .select(col("block_number"), col("tag"),
        col("amount").cast(Rewards.wei).as("amount"))
    db.append("transactions", txs)
    assert(db.exists("transactions"))
    val got = db.read("transactions").collect()
      .map(r => r.getAs[Long]("block_number") -> r.getAs[String]("amount")).toMap
    assert(got(1L) == big) // survived intact through varchar
    assert(got(2L) == "500")
  }

  test("deleteRange retracts exactly the reorg span") {
    val db = freshDb()
    val rows = (1L to 20L).map(n => (n, s"h$n")).toDF("block_number", "tag")
    db.append("block_headers", rows)
    db.deleteRange("block_headers", "block_number", 7L, 15L)
    val left = db.read("block_headers").collect().map(_.getAs[Long]("block_number")).sorted
    assert(left.toSeq == ((1L to 6L) ++ (16L to 20L)))
    // appended again (the winning branch) — no residue, no duplicates
    db.append("block_headers", (7L to 15L).map(n => (n, s"f$n")).toDF("block_number", "tag"))
    assert(db.read("block_headers").count() == 20L)
  }

  test("appendRange replays the same chunk idempotently (common/errors.go:48-57)") {
    val db = freshDb()
    def chunk(tag: String) = (5L to 9L).map(n => (n, s"$tag$n")).toDF("block_number", "v")
    db.appendRange("replay", chunk("a"), "block_number", 5L, 9L) // table created
    db.appendRange("replay", chunk("a"), "block_number", 5L, 9L) // crashed-loop replay
    assert(db.read("replay").count() == 5L) // no duplicates, no error
    // a replay carrying the WINNING branch's rows replaces the old chunk
    db.appendRange("replay", chunk("b"), "block_number", 5L, 9L)
    val got = db.read("replay").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == (5L to 9L).map(n => n -> s"b$n").toMap)
    // rows outside the declared range are untouched
    db.append("replay", Seq((1L, "keep")).toDF("block_number", "v"))
    db.appendRange("replay", chunk("c"), "block_number", 5L, 9L)
    assert(db.read("replay").count() == 6L)
  }

  test("usable as a foreachBatch mirror target") {
    val db  = freshDb()
    val hdr = Seq((1L, hash32(1), 1000L)).toDF("number", "hash", "difficulty")
    // the shape ChainIngest.appendChunk would call inside foreachBatch
    db.append("mirror_headers", hdr)
    val r = db.read("mirror_headers").head()
    assert(r.getAs[Long]("number") == 1L)
    assert(r.getAs[Array[Byte]]("hash").toSeq == hash32(1).toSeq)
  }
}
