package graft.functions

import java.math.BigInteger
import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The native uint256 aggregate pair at FULL range — sums and maxima of
  * values near 2^256, where Decimal(38) (and every SQL engine's widest
  * integer) cannot follow; the reference answer is BigInteger. The
  * 96-bit oracle-checkable face is query a18.
  */
class Uint256AggSpec extends SparkSpec {
  import spark.implicits._

  private def be(bi: BigInteger): Array[Byte] = {
    // 32-byte big-endian, left-padded (strip BigInteger's sign byte)
    val raw = bi.toByteArray.dropWhile(_ == 0)
    val out = new Array[Byte](32)
    raw.copyToArray(out, 32 - raw.length)
    out
  }

  test("sum and max are exact beyond 38 digits (values near 2^256)") {
    val big = BigInteger.TWO.pow(255) // 77 digits — above Decimal(38)
    val vals = (0 until 7).map(i => big.subtract(BigInteger.valueOf(i * 1000003L)))
    val df = vals.zipWithIndex
      .map { case (v, i) => (i.toLong, if (i % 3 == 0) "a" else "b", be(v)) }
      .toDF("id", "g", "v")
    val got = df.groupBy("g")
      .agg(Uint256Agg.sum($"v").as("s"), Uint256Agg.max($"v").as("m"))
      .collect().map(r => r.getString(0) -> ((r.getString(1), r.getString(2)))).toMap
    def expect(p: Int => Boolean) = {
      val vs = vals.zipWithIndex.filter(t => p(t._2)).map(_._1)
      (vs.foldLeft(BigInteger.ZERO)(_ add _).toString, vs.max.toString)
    }
    assert(got("a") == expect(_ % 3 == 0))
    assert(got("b") == expect(_ % 3 != 0))
    // the sums genuinely exceeded what Decimal(38) holds
    assert(got("a")._1.length > 38 && got("b")._1.length > 38)
  }

  test("null inputs skip; empty groups: sum '0', max NULL; partials merge") {
    val rows: Seq[(String, Array[Byte])] = Seq(
      ("g", be(BigInteger.valueOf(5))), ("g", null), ("g", be(BigInteger.valueOf(7))))
    // 8 slices force partial buffers to MERGE across partitions
    val got = rows.toDF("g", "v").repartition(8)
      .groupBy("g").agg(Uint256Agg.sum($"v").as("s"), Uint256Agg.max($"v").as("m"))
      .collect()(0)
    assert(got.getString(1) == "12" && got.getString(2) == "7")
    val empty = rows.toDF("g", "v").filter($"g" === "nope")
      .agg(Uint256Agg.sum($"v").as("s"), Uint256Agg.max($"v").as("m")).collect()(0)
    assert(empty.getString(0) == "0" && empty.isNullAt(1),
      "empty input: sum is '0', max is NULL")
  }

  test("short and empty byte arrays read as unsigned big-endian values") {
    val rows = Seq(
      ("g", Array[Byte](0x01, 0x00)),            // 256
      ("g", Array[Byte](0xff.toByte)),           // 255 — unsigned, not -1
      ("g", Array.empty[Byte]))                  // 0
    val got = rows.toDF("g", "v")
      .agg(Uint256Agg.sum($"v").as("s"), Uint256Agg.max($"v").as("m")).collect()(0)
    assert(got.getString(0) == "511" && got.getString(1) == "256")
  }
}
