package graft.queries

import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** SURVEY.md §2.8 scalar-function layer over testdata. The eth-specific
  * binary codecs these model (hex/0x handling, topic split, ABI decode,
  * sentinel classification — common/utils.go, store/event_erc20.go) are
  * exercised on string/binary columns of the documents/events tables; the
  * chain-typed versions live in graft.functions with ScalaTest coverage.
  */
object FunctionQueries {

  val defs: Map[String, QueryDef] = Map(

    // F1 — hex encode/decode + 0x prefix + lowercase (common/utils.go:43-75)
    "f1_hex_codec" -> QueryDef.sql(
      (s, d) => Tables(s, d).documents
        .withColumn("head", substring(col("text"), 1, 8))
        .select(
          col("doc_id"),
          hex(encode(col("head"), "UTF-8")).as("hex_head"),
          concat(lit("0x"), lower(hex(encode(col("head"), "UTF-8")))).as("addr_style"),
          decode(unhex(hex(encode(col("head"), "UTF-8"))), "UTF-8").as("roundtrip"))
        .orderBy("doc_id"),
      """SELECT doc_id, hex(substr(text,1,8)) AS hex_head,
        |   '0x' || lower(hex(substr(text,1,8))) AS addr_style,
        |   substr(text,1,8) AS roundtrip
        | FROM documents ORDER BY doc_id""".stripMargin
    ),

    // F2 — decimal-string parse with positivity check (common/utils.go:77-83
    // ParseTd rejects td <= 0). Parsed via DECIMAL(38,0) to model the full
    // reference domain, then canonicalized to BIGINT for the oracle hash
    // (extracted digit runs in this fixture are bounded — same final-cast
    // pattern as a4-a9).
    "f2_decimal_parse" -> QueryDef.sql(
      (s, d) => Tables(s, d).events
        .withColumn("k", regexp_extract(col("props"), "(\\d+)", 1).cast(DecimalType(38, 0)))
        .filter(col("k") > 0)
        .select(col("event_id"), col("k").cast("long").as("k"))
        .orderBy("event_id"),
      """SELECT event_id, CAST(CAST(regexp_extract(props, '(\d+)', 1) AS DECIMAL(38,0)) AS BIGINT) AS k
        | FROM events WHERE CAST(regexp_extract(props, '(\d+)', 1) AS DECIMAL(38,0)) > 0
        | ORDER BY event_id""".stripMargin
    ),

    // F3 — timestamp formatting, reference format '2006-01-02 15:04:05' UTC
    // (store/sqldb/db.go:31-36,175-177)
    "f3_date_format" -> QueryDef.sql(
      (s, d) => Tables(s, d).orders
        .filter(col("o_orderkey") < 100L)
        .select(col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss").as("formatted"))
        .orderBy("o_orderkey"),
      """SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS formatted
        | FROM orders WHERE o_orderkey < 100 ORDER BY o_orderkey""".stripMargin
    ),

    // F4 — big-endian uint64 → 8-byte hex (common/utils.go:97-98 nonce codec)
    "f4_bigendian_nonce" -> QueryDef.sql(
      (s, d) => Tables(s, d).orders
        .filter(col("o_orderkey") < 100L)
        .select(col("o_orderkey"),
          lpad(hex(col("o_orderkey")), 16, "0").as("nonce_hex"))
        .orderBy("o_orderkey"),
      """SELECT o_orderkey, lpad(hex(o_orderkey), 16, '0') AS nonce_hex
        | FROM orders WHERE o_orderkey < 100 ORDER BY o_orderkey""".stripMargin
    ),

    // F5 — signature-constant match (store/event_erc20.go:32-35,42: keccak
    // Transfer topic equality): digest prefix filter, md5 stands in for
    // keccak (not in either engine's builtin set).
    "f5_sig_match" -> QueryDef.sql(
      (s, d) => Tables(s, d).documents
        .withColumn("digest", md5(col("text")))
        .filter(substring(col("digest"), 1, 1) === "a")
        .select("doc_id", "digest")
        .orderBy("doc_id"),
      """SELECT doc_id, md5(text) AS digest FROM documents
        | WHERE substr(md5(text), 1, 1) = 'a' ORDER BY doc_id""".stripMargin
    ),

    // F6 — topic split with NA default (common/utils.go:33-35,162-193:
    // topics[0]→event_name else "NA", topics[1..3]→topic1..3)
    "f6_topic_split" -> QueryDef.sql(
      (s, d) => {
        val toks = split(trim(col("text")), "\\s+")
        Tables(s, d).documents.select(
          col("doc_id"),
          coalesce(get(toks, lit(0)), lit("NA")).as("event_name"),
          coalesce(get(toks, lit(1)), lit("NA")).as("topic1"),
          coalesce(get(toks, lit(2)), lit("NA")).as("topic2"),
          coalesce(get(toks, lit(3)), lit("NA")).as("topic3")
        ).orderBy("doc_id")
      },
      """SELECT doc_id,
        |   coalesce(regexp_split_to_array(trim(text), '\s+')[1], 'NA') AS event_name,
        |   coalesce(regexp_split_to_array(trim(text), '\s+')[2], 'NA') AS topic1,
        |   coalesce(regexp_split_to_array(trim(text), '\s+')[3], 'NA') AS topic2,
        |   coalesce(regexp_split_to_array(trim(text), '\s+')[4], 'NA') AS topic3
        | FROM documents ORDER BY doc_id""".stripMargin
    ),

    // F7 — fixed-offset ABI-style hex decode to integer
    // (contracts/utils.go:43-72, store/event_erc20.go:44-49)
    "f7_abi_decode" -> QueryDef.sql(
      (s, d) => Tables(s, d).documents
        .withColumn("word", substring(md5(col("text")), 1, 4))
        .select(col("doc_id"), col("word"),
          conv(col("word"), 16, 10).cast("long").as("decoded"))
        .orderBy("doc_id"),
      """SELECT doc_id, substr(md5(text),1,4) AS word,
        |   (instr('0123456789abcdef', substr(md5(text),1,1)) - 1) * 4096
        | + (instr('0123456789abcdef', substr(md5(text),2,1)) - 1) * 256
        | + (instr('0123456789abcdef', substr(md5(text),3,1)) - 1) * 16
        | + (instr('0123456789abcdef', substr(md5(text),4,1)) - 1) AS decoded
        | FROM documents ORDER BY doc_id""".stripMargin
    ),

    // F8 — address extraction from 32-byte topic = fixed substring
    // (store/event_erc20.go:55-56 BytesToAddress truncation)
    "f8_addr_extract" -> QueryDef.sql(
      (s, d) => Tables(s, d).documents
        .withColumn("digest", md5(col("text")))
        .select(col("doc_id"), substring(col("digest"), 25, 8).as("addr_tail"))
        .orderBy("doc_id"),
      """SELECT doc_id, substr(md5(text), 25, 8) AS addr_tail
        | FROM documents ORDER BY doc_id""".stripMargin
    ),

    // F10 — sentinel classification (model/types.go:215-224:
    // IsMinerRewardEvent / IsUncleRewardEvent predicates)
    "f10_sentinel_classify" -> QueryDef.sql(
      (s, d) => Tables(s, d).events
        .withColumn("kind",
          when(col("event_type") === "signup", "MINER_REWARD")
            .when(col("event_type") === "error", "UNCLE_REWARD")
            .otherwise("TX"))
        .groupBy("kind").agg(count(lit(1)).as("n"))
        .orderBy("kind"),
      """SELECT CASE WHEN event_type = 'signup' THEN 'MINER_REWARD'
        |             WHEN event_type = 'error' THEN 'UNCLE_REWARD'
        |             ELSE 'TX' END AS kind, count(*) AS n
        | FROM events GROUP BY 1 ORDER BY kind""".stripMargin
    ),

    // F9 — EIP-155 signer recovery (common/utils.go:120-127 via geth
    // types.Sender). Fixture txs are signed in-process with deterministic
    // keys/nonces; Spark recovers the sender from (fields, v, r, s) through
    // the secp256k1 UDF, while the oracle states the EXPECTED addresses
    // derived directly from the private keys — two independent paths that
    // must agree, hash-checked like any other query.
    "f9_signer_recovery" -> QueryDef.sql(
      (s, _) => {
        import s.implicits._
        F9Fixture.txs.toDF("tx_id", "nonce", "gas_price", "gas_limit", "to",
            "amount", "payload", "v", "r", "sig_s")
          .select(col("tx_id"),
            lower(hex(graft.functions.ChainFunctions.recoverSigner(
              col("nonce"), col("gas_price"), col("gas_limit"), col("to"),
              col("amount"), col("payload"), col("v"), col("r"), col("sig_s"))))
              .as("signer"))
          .orderBy("tx_id")
      },
      F9Fixture.oracleSql
    )
  )
}

/** Deterministic signed-tx fixture for f9 (shaped like the reference's
  * store/store_test.go:45-58 signed fixtures). Signing happens at class
  * load with fixed keys and nonces; the oracle is the VALUES list of
  * key-derived addresses — recovery must invert signing exactly.
  */
object F9Fixture {
  import java.math.BigInteger
  import graft.functions.{ChainFunctions, Secp256k1}

  private def pad32(x: BigInteger): Array[Byte] = {
    val out = new Array[Byte](32)
    val raw = x.toByteArray.dropWhile(_ == 0)
    System.arraycopy(raw, 0, out, 32 - raw.length, raw.length)
    out
  }

  /** (txId, nonce, gasPrice, gasLimit, to, amountStr, payload, v, r, s) */
  lazy val txs: Seq[(Long, Long, Long, Long, Array[Byte], String, Array[Byte], Long, Array[Byte], Array[Byte])] =
    (1 to 40).map { i =>
      val priv    = new BigInteger(f"$i%02x" * 32, 16)
      val chainId = if (i % 4 == 0) 0L else 1L + (i % 3) // mix legacy + EIP-155
      val to      = if (i % 5 == 0) null else java.util.Arrays.copyOf(BigInt(i).toByteArray, 20)
      val amount  = (BigInt(10).pow(18) * i).toString
      val payload = if (i % 3 == 0) Array[Byte](1, 2, i.toByte) else Array.emptyByteArray
      val hash = ChainFunctions.signingHash(i.toLong, BigInteger.valueOf(1000000000L + i),
        21000L + i, to, new BigInteger(amount), payload, chainId)
      val (r, s, recId) = Secp256k1.signWithK(hash, priv,
        new BigInteger(f"a${i}%03dc" * 8, 16))
      val v = if (chainId > 0) 2 * chainId + 35 + recId else 27L + recId
      (i.toLong, i.toLong, 1000000000L + i, 21000L + i, to, amount, payload, v, pad32(r), pad32(s))
    }

  lazy val oracleSql: String = {
    val rows = (1 to 40).map { i =>
      val priv = new BigInteger(f"$i%02x" * 32, 16)
      val addr = Secp256k1.pointToAddress(Secp256k1.mul(Secp256k1.G, priv))
        .map("%02x".format(_)).mkString
      s"($i, '$addr')"
    }.mkString(",\n   ")
    s"""SELECT * FROM (VALUES
       |   $rows) AS t(tx_id, signer) ORDER BY tx_id""".stripMargin
  }
}
