package graft.streaming

import java.util
import scala.collection.concurrent.TrieMap
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.encoders.{AgnosticEncoder, ExpressionEncoder}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import graft.chain.Schemas.Bundle

/** S1 — the new-head subscription as a REAL Structured Streaming source
  * (DataSourceV2 MicroBatchStream), not just foreachBatch over a test
  * stream. Mirrors the reference's WS `SubscribeNewHead` feed
  * (client/subscriber.go:28-31) consumed by the sequential Listen loop
  * (service/indexer/indexer.go:122-172):
  *
  *   - offsets are bundle sequence numbers → restart replays exactly the
  *     uncommitted tail from the checkpoint;
  *   - admission control caps a trigger at `maxBlocksPerTrigger` bundles —
  *     the reference's maxBlocksToInsert=50 catch-up throttle
  *     (indexer.go:39,218-246) expressed as a ReadLimit;
  *   - the subscription itself is a pluggable driver-side feed (the WS
  *     client's natural home); executors read the planned micro-batch.
  */
trait HeadSubscription {
  /** Highest available sequence number (sequences start at 1). */
  def latestSeq: Long

  /** Bundles with sequence in (fromSeq, toSeq], ascending. */
  def range(fromSeq: Long, toSeq: Long): Seq[Bundle]

  /** Ancestor fetch-back — the reference's `getBlockByHash` during branch
    * tracing (service/indexer/indexer.go:370-406): when a winning branch's
    * ancestry is neither stored, in the batch, nor pooled (e.g. the blocks
    * were canonical once and a reorg retracted them), the ingest fold asks
    * the feed. None = unavailable (the default for feeds that cannot look
    * back); such branches stay orphaned until re-delivered.
    */
  def byHash(hash: Seq[Byte]): Option[Bundle] = None
}

/** In-memory append-only subscription — tests and single-process use. */
final class QueueHeadSubscription extends HeadSubscription {
  private val buf = scala.collection.mutable.ArrayBuffer.empty[Bundle]
  private val idx = scala.collection.mutable.Map.empty[Seq[Byte], Bundle]
  def push(bs: Bundle*): Unit = synchronized {
    buf ++= bs
    bs.foreach(b => idx(b.block.hash.toSeq) = b)
  }
  override def latestSeq: Long = synchronized(buf.length.toLong)
  override def range(fromSeq: Long, toSeq: Long): Seq[Bundle] =
    synchronized(buf.slice(fromSeq.toInt, toSeq.toInt).toVector)
  override def byHash(hash: Seq[Byte]): Option[Bundle] = synchronized(idx.get(hash))
}

/** Registry wiring subscriptions through DSv2 string options (the provider
  * is instantiated reflectively from its class name, so instances can't be
  * passed directly).
  */
object HeadSubscriptions {
  private val registry = TrieMap.empty[String, HeadSubscription]
  def register(id: String, s: HeadSubscription): Unit = registry(id) = s
  def get(id: String): HeadSubscription =
    registry.getOrElse(id, throw new IllegalArgumentException(s"no subscription '$id'"))
}

object BundleStream {
  val SubscriptionOption = "subscription"
  val MaxBlocksOption    = "maxblockspertrigger"

  private[streaming] val encoder: ExpressionEncoder[Bundle] =
    ExpressionEncoder(Encoders.product[Bundle].asInstanceOf[AgnosticEncoder[Bundle]])

  val schema: StructType = encoder.schema
}

case class BundleOffset(seq: Long) extends Offset {
  override def json: String = seq.toString
}

class BundleStreamProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = BundleStream.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val subId = properties.get(BundleStream.SubscriptionOption)
    require(subId != null, s"option '${BundleStream.SubscriptionOption}' is required")
    val maxPerTrigger = Option(properties.get(BundleStream.MaxBlocksOption))
      .map(_.toInt).getOrElse(50) // maxBlocksToInsert, indexer.go:39
    new BundleTable(subId, maxPerTrigger)
  }
}

class BundleTable(subId: String, maxPerTrigger: Int) extends Table with SupportsRead {
  override def name(): String          = s"bundles($subId)"
  override def schema(): StructType    = BundleStream.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new BundleScan(subId, maxPerTrigger)
}

class BundleScan(subId: String, maxPerTrigger: Int) extends Scan {
  override def readSchema(): StructType = BundleStream.schema
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new BundleMicroBatchStream(subId, maxPerTrigger)
}

class BundleMicroBatchStream(subId: String, maxPerTrigger: Int)
    extends MicroBatchStream with SupportsAdmissionControl {

  private def sub = HeadSubscriptions.get(subId)

  override def initialOffset(): Offset = BundleOffset(0L)
  override def deserializeOffset(json: String): Offset = BundleOffset(json.toLong)

  override def getDefaultReadLimit: ReadLimit = ReadLimit.maxRows(maxPerTrigger)

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException("use latestOffset(start, limit)")

  /** T3 as admission control: at most maxRows bundles per trigger. */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s      = start.asInstanceOf[BundleOffset].seq
    val latest = sub.latestSeq
    val end = limit match {
      case r: ReadMaxRows => math.min(latest, s + r.maxRows())
      case _              => latest
    }
    BundleOffset(end)
  }

  override def reportLatestOffset(): Offset = BundleOffset(sub.latestSeq)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s   = start.asInstanceOf[BundleOffset].seq
    val e   = end.asInstanceOf[BundleOffset].seq
    val ser = BundleStream.encoder.createSerializer()
    // The feed is driver-side (like the WS client); a micro-batch is ≤
    // maxPerTrigger header bundles — payload fan-out happens downstream.
    val rows: Array[InternalRow] =
      sub.range(s, e).map(b => ser(b).copy()).toArray
    Array(BundleInputPartition(rows))
  }

  override def createReaderFactory(): PartitionReaderFactory = new BundleReaderFactory

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit             = ()
}

case class BundleInputPartition(rows: Array[InternalRow]) extends InputPartition

class BundleReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val rows = p.asInstanceOf[BundleInputPartition].rows
    new PartitionReader[InternalRow] {
      private var i = -1
      override def next(): Boolean     = { i += 1; i < rows.length }
      override def get(): InternalRow  = rows(i)
      override def close(): Unit       = ()
    }
  }
}
