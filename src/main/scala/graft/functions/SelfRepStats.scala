package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Within-document repeated-span statistics (the d16 kernel) as ONE native
  * pass over the text — codegen twin of the declarative chain
  *
  *   srt  = array_sort(transform(sequence(1, L-k+1),
  *            i -> struct(xxhash64(substring(txt, i, k)), i)))
  *   rep  = sorted positions whose hash equals its sort-predecessor's
  *   cov  = gaps-and-islands fold over rep with spans [p, p+k)
  *
  * which itself replaced the exploded two-window form. The declarative
  * in-row form is shuffle-free but pays an interpreted struct sort plus
  * boxed HOF lambdas per gram; this kernel is a single hash-set pass:
  * positions arrive in ascending order by construction, so no sort is
  * needed at all, and the islands fold runs inline.
  *
  * Semantics pinned to the declarative form (and the oracle SQL):
  *   - gram hash = Spark's xxhash64(substring(txt, i, k)) — computed here
  *     as XXH64 (seed 42) over the UTF-8 BYTES of the char window
  *     [i, i+k), which is byte-identical to hashing the substring
  *     (substring copies exactly those bytes);
  *   - position i is a repeat iff its hash occurred at any smaller i
  *     (≡ "pos > min pos of the (doc, hash) group");
  *   - n_repeat_grams = repeat count; covered_chars = Σ island extents
  *     over spans [i, i+k) merged while ascending;
  *   - text NULL or shorter than k → (0, 0) (the declarative CASE/empty-
  *     fold path; the fraction projection divides by greatest(len, 1)).
  *
  * Output: non-null struct(n_repeat_grams BIGINT, covered_chars BIGINT).
  * SelfRepStatsSpec pins equality against the declarative chain.
  */
case class SelfRepStatsExpr(child: Expression, k: Int) extends UnaryExpression {

  require(k > 0, "k must be positive")

  override def dataType: DataType = SelfRepStats.OutType
  override def nullable: Boolean = false // null text → (0, 0)
  override def prettyName: String = "self_rep_stats"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING input, got ${child.dataType.catalogString}")

  override def eval(input: InternalRow): Any =
    SelfRepStats.compute(child.eval(input).asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(
      code = c.code +
        code"""
           |InternalRow ${ev.value} = graft.functions.SelfRepStats.compute(
           |  ${c.isNull} ? null : ${c.value}, $k);
           |""".stripMargin,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): SelfRepStatsExpr =
    copy(child = newChild)
}

object SelfRepStats {

  val OutType: StructType = StructType(Seq(
    StructField("n_repeat_grams", LongType, nullable = false),
    StructField("covered_chars", LongType, nullable = false)))

  private val Zero = new GenericInternalRow(Array[Any](0L, 0L))

  /** Open-addressing long set — avoids a boxed HashSet<Long> per gram.
    * Zero is a legal hash value, tracked by a flag.
    */
  private final class LongSet(expected: Int) {
    private var cap = Integer.highestOneBit(math.max(16, expected * 2) - 1) << 1
    private var keys = new Array[Long](cap)
    private var used = new Array[Boolean](cap)
    private var size = 0
    private var hasZero = false
    /** @return true if newly added, false if already present */
    def add(v: Long): Boolean = {
      if (v == 0L) {
        if (hasZero) return false
        hasZero = true; return true
      }
      if (size * 4 >= cap * 3) grow()
      var i = (java.lang.Long.hashCode(v * -7046029254386353131L) & (cap - 1))
      while (used(i)) {
        if (keys(i) == v) return false
        i = (i + 1) & (cap - 1)
      }
      keys(i) = v; used(i) = true; size += 1
      true
    }
    private def grow(): Unit = {
      val ok = keys; val ou = used
      cap <<= 1
      keys = new Array[Long](cap); used = new Array[Boolean](cap); size = 0
      var j = 0
      while (j < ok.length) {
        if (ou(j)) { size += 1
          var i = (java.lang.Long.hashCode(ok(j) * -7046029254386353131L) & (cap - 1))
          while (used(i)) i = (i + 1) & (cap - 1)
          keys(i) = ok(j); used(i) = true
        }
        j += 1
      }
    }
  }

  /** Static kernel for interpreted and generated code. One pass, one
    * long-set, zero per-gram allocation (hashes the char window's bytes
    * in place — byte-identical to xxhash64(substring(t, i, k))).
    */
  def compute(t: UTF8String, k: Int): InternalRow = {
    if (t == null) return Zero
    val nChars = t.numChars()
    val n = nChars - k + 1
    if (n <= 0) return Zero
    // byte offset of each char position (0-based), one walk
    val base = t.getBaseObject
    val start = t.getBaseOffset
    val nBytes = t.numBytes()
    val offs = new Array[Int](nChars + 1)
    var ci = 0
    var bi = 0
    while (bi < nBytes) {
      offs(ci) = bi
      bi += UTF8String.numBytesForFirstByte(org.apache.spark.unsafe.Platform.getByte(base, start + bi))
      ci += 1
    }
    offs(nChars) = nBytes
    val seen = new LongSet(n)
    var nRep = 0L
    var cov = 0L
    var st = -1 // open island start position (1-based), -1 = none
    var en = -1 // open island running max end
    var i = 1
    while (i <= n) {
      val from = offs(i - 1)
      val len = offs(i - 1 + k) - from
      val h = org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUnsafeBytes(base, start + from, len, 42L)
      if (!seen.add(h)) { // repeat: same fold as the declarative islands
        nRep += 1L
        val e = i + k
        if (st == -1) { st = i; en = e }
        else if (i > en) { cov += (en - st).toLong; st = i; en = e }
        else if (e > en) { en = e }
        i += 1
      } else i += 1
    }
    if (st != -1) cov += (en - st).toLong
    new GenericInternalRow(Array[Any](nRep, cov))
  }

  def apply(c: Column, k: Int): Column =
    GraftSqlBridge.column(SelfRepStatsExpr(GraftSqlBridge.expression(c), k))
}
