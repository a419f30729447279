package graft.chain

import java.util.{Collections, LinkedHashMap => JLinkedHashMap, Map => JMap}
import org.apache.spark.sql.{DataFrame, Row}
import scala.collection.immutable.ArraySeq

/** Read-through cache over the hot point lookups of [[ChainStore]] — the
  * Spark face of the reference's ARC cache middlewares, which wrap every
  * serving-path store in a 128-entry block/TD cache
  * (store/block_header/cache.go:36-138, client/cache.go:29-141).
  *
  * An entry holds the COLLECTED rows of one point lookup (≤1 row each), so
  * a hit is replanned from a LocalRelation: no file scan, no shuffle, no
  * job against the backing tables — the exact work the reference's cache
  * saves its SQL backend. The reference uses ARC; here a bounded
  * access-ordered LRU gives the same contract (bounded memory, hot keys
  * survive) without ARC's ghost lists, which earn their keep against
  * scan-polluted DB buffer pools, not a point-lookup memo.
  *
  * Retraction invalidates (the analogue of the eviction the reference's
  * indexer performs when a reorg rewinds its stores): `invalidateRange`
  * drops every entry whose cached row sits in the retracted block interval
  * — and every EMPTY (negative) entry, because the winning branch can
  * materialize a block that was previously absent.
  *
  * Thread-safe; the map is the JDK synchronized wrapper and sweeps hold
  * its monitor, matching `Collections.synchronizedMap`'s iteration rule.
  */
final class CachedChainStore private (mkUnderlying: () => ChainStore, maxEntries: Int) {
  require(maxEntries > 0, "maxEntries must be positive")

  /** Snapshot form: lookups plan against the given facade's DataFrames
    * (fine for an immutable store view). A MUTATING store needs
    * [[CachedChainStore.live]] — a path-based DataFrame pins its file
    * listing at construction, so a reorg's bucket rewrite would otherwise
    * leave misses reading deleted part files.
    */
  def this(underlying: ChainStore, maxEntries: Int = 128) =
    this(() => underlying, maxEntries)

  def underlying: ChainStore = mkUnderlying()

  private type Key = (String, ArraySeq[Byte])
  private final case class Entry(rows: Array[Row], schema: org.apache.spark.sql.types.StructType,
                                 session: org.apache.spark.sql.SparkSession,
                                 blockNumbers: Seq[Long])

  private val cache: JMap[Key, Entry] =
    Collections.synchronizedMap(
      new JLinkedHashMap[Key, Entry](16, 0.75f, true) {
        override def removeEldestEntry(e: JMap.Entry[Key, Entry]): Boolean =
          this.size() > maxEntries
      })

  // per-key miss locks: concurrent misses for the SAME key run the backing
  // lookup (a scan job under `live`) once, not once per caller — while
  // hits and misses for other keys proceed untouched. The lock entry is
  // transient: removed once the winner has published the entry.
  private val missLocks = new java.util.concurrent.ConcurrentHashMap[Key, Object]()

  /** Serve `kind`/`key` from cache, else collect the lookup once and
    * remember it. `numberCol` names the block-height column of the result
    * — the invalidation key a retraction sweeps on. The by-name `lookup`
    * is forced ONLY on a miss: a hit must not re-resolve the backing
    * facade (under [[CachedChainStore.live]] that would re-list files per
    * hit, the exact work the cache exists to save) — hits replan from the
    * memoized rows + schema alone.
    */
  private def memo(kind: String, key: Array[Byte], lookup: => DataFrame,
                   numberCol: String): DataFrame = {
    val k: Key = (kind, ArraySeq.unsafeWrapArray(key))
    val hit = cache.get(k)
    val entry =
      if (hit != null) hit
      else {
        val lock = missLocks.computeIfAbsent(k, _ => new Object)
        try lock.synchronized {
          val again = cache.get(k) // the stampede loser finds it published
          if (again != null) again
          else {
            val df = lookup
            val rows = df.collect()
            // capture the session at miss time: a hit must not depend on
            // the caller thread's ambient active-session state
            val e = Entry(rows, df.schema, df.sparkSession,
              ArraySeq.unsafeWrapArray(rows.map(_.getAs[Long](numberCol))))
            cache.put(k, e)
            e
          }
        } finally missLocks.remove(k, lock) // conditional: never unmap another thread's newer lock
      }
    // prefer the captured session; if the application replaced it since
    // the miss, the memoized rows are still servable on the live one
    val session =
      if (!entry.session.sparkContext.isStopped) entry.session
      else org.apache.spark.sql.SparkSession.active
    session.createDataFrame(
      java.util.Arrays.asList(entry.rows: _*), entry.schema)
  }

  // -- the reference's cached lookups (block_header/cache.go, client/cache.go)
  def findBlockByHash(hash: Array[Byte]): DataFrame =
    memo("blockByHash", hash, underlying.findBlockByHash(hash), "number")

  def findBlockByNumber(n: Long): DataFrame =
    memo("blockByNumber", java.nio.ByteBuffer.allocate(8).putLong(n).array(),
      underlying.findBlockByNumber(n), "number")

  def findTd(hash: Array[Byte]): DataFrame =
    memo("td", hash, underlying.findTd(hash), "block")

  def findTransaction(hash: Array[Byte]): DataFrame =
    memo("txByHash", hash, underlying.findTransaction(hash), "block_number")

  /** Receipt by tx hash — the serving face of the reference's cached
    * receipt middleware (GetBlockReceipts, client/cache.go:122-140; this
    * store serves per-tx, so the memo key is the tx hash).
    */
  def findReceipt(txHash: Array[Byte]): DataFrame =
    memo("receiptByTx", txHash, underlying.findReceipt(txHash), "block_number")

  /** Drop every entry touching the retracted interval [from, to], plus all
    * negative (empty) entries — a reorg may have created what was missing.
    */
  def invalidateRange(from: Long, to: Long): Unit = cache.synchronized {
    val it = cache.entrySet().iterator()
    while (it.hasNext) {
      val nums = it.next().getValue.blockNumbers
      if (nums.isEmpty || nums.exists(n => n >= from && n <= to)) it.remove()
    }
  }

  def invalidateAll(): Unit = cache.clear()

  def size: Int = cache.size()
}

object CachedChainStore {
  /** Cache over a LIVE (mutating) store: every miss re-resolves the
    * backing files through a fresh facade, so a reorg rewrite is served
    * correctly the moment its entries are invalidated — hits still replan
    * from the memo with no scan job.
    */
  def live(mkUnderlying: () => ChainStore, maxEntries: Int = 128): CachedChainStore =
    new CachedChainStore(mkUnderlying, maxEntries)
}
