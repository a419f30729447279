package graft.functions

import java.math.BigInteger
import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Full-range uint256 aggregation over big-endian BINARY columns — the
  * native pair that removes the engine's one declared numeric ceiling
  * (SURVEY §7: [[Uint256ToDecimal]] nulls above 10^38−1 because Spark's
  * widest decimal is 38 digits; the reference's own storage caps at
  * varchar(32), model/types.go:72-81, so the ceiling never bit a ported
  * query — but a chain with 77+-digit aggregate flows would hit it).
  * State is one java.math.BigInteger per group (≤ 40 bytes at any sum of
  * 2^256-bounded inputs a real chain can produce), partials merge
  * associatively (add / unsigned max), so the shuffle carries one tiny
  * buffer per group — the same algebra as every combine-friendly sum.
  * Results emit as DECIMAL STRINGS (exact at any width; cross-engine
  * comparable — DuckDB mirrors with HUGEINT/UHUGEINT arithmetic up to
  * 128 bits, and the unit spec covers the beyond-128-bit range against
  * BigInteger directly).
  */
abstract class Uint256Agg extends TypedImperativeAggregate[BigInteger] {

  def child: Expression
  override def children: Seq[Expression] = Seq(child)
  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires BINARY input, got ${child.dataType.catalogString}")

  protected def fold(buffer: BigInteger, v: BigInteger): BigInteger

  override def update(buffer: BigInteger, input: InternalRow): BigInteger = {
    val v = child.eval(input)
    if (v == null) buffer
    else fold(buffer, new BigInteger(1, v.asInstanceOf[Array[Byte]]))
  }

  override def serialize(buffer: BigInteger): Array[Byte] = buffer.toByteArray
  override def deserialize(bytes: Array[Byte]): BigInteger = new BigInteger(bytes)
}

/** Unsigned full-precision sum; empty groups evaluate to "0". */
case class Uint256SumAgg(child: Expression,
                         mutableAggBufferOffset: Int = 0,
                         inputAggBufferOffset: Int = 0) extends Uint256Agg {
  override def prettyName: String = "uint256_sum"
  override def createAggregationBuffer(): BigInteger = BigInteger.ZERO
  override protected def fold(b: BigInteger, v: BigInteger): BigInteger = b.add(v)
  override def merge(b: BigInteger, o: BigInteger): BigInteger = b.add(o)
  override def eval(buffer: BigInteger): Any = UTF8String.fromString(buffer.toString)
  override def withNewMutableAggBufferOffset(o: Int): Uint256SumAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): Uint256SumAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Uint256SumAgg =
    copy(child = c.head)
}

/** Unsigned full-precision max (the 256-bit COMPARE half of the pair);
  * empty groups evaluate to SQL NULL. Sentinel −1 marks "no value yet" —
  * inputs are unsigned, so it can never collide with a real value.
  */
case class Uint256MaxAgg(child: Expression,
                         mutableAggBufferOffset: Int = 0,
                         inputAggBufferOffset: Int = 0) extends Uint256Agg {
  override def prettyName: String = "uint256_max"
  private val None256 = BigInteger.valueOf(-1L)
  override def createAggregationBuffer(): BigInteger = None256
  override protected def fold(b: BigInteger, v: BigInteger): BigInteger = b.max(v)
  override def merge(b: BigInteger, o: BigInteger): BigInteger = b.max(o)
  override def eval(buffer: BigInteger): Any =
    if (buffer.signum() < 0) null else UTF8String.fromString(buffer.toString)
  override def withNewMutableAggBufferOffset(o: Int): Uint256MaxAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): Uint256MaxAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Uint256MaxAgg =
    copy(child = c.head)
}

object Uint256Agg {
  /** Σ of big-endian unsigned binary values, as an exact decimal string. */
  def sum(c: Column): Column =
    GraftSqlBridge.column(
      Uint256SumAgg(GraftSqlBridge.expression(c)).toAggregateExpression())

  /** Unsigned max of big-endian binary values, as an exact decimal string. */
  def max(c: Column): Column =
    GraftSqlBridge.column(
      Uint256MaxAgg(GraftSqlBridge.expression(c)).toAggregateExpression())
}
