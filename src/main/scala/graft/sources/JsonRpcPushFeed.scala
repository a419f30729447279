package graft.sources

import java.io.{BufferedReader, InputStreamReader}
import java.net.{HttpURLConnection, URI}
import java.nio.charset.StandardCharsets

/** The PUSH face of the feed adapter — the reference subscribes to geth's
  * WS `newHeads` stream and reacts to each head instead of polling
  * (client/subscriber.go:28-31, service/indexer/indexer.go:155-171). This
  * re-expresses that shape over plain HTTP chunked transfer: one long-lived
  * GET against `subscribeUrl` whose body is a newline-delimited stream of
  * head notifications (`{"number":"0x…","hash":"0x…"}`), exactly the
  * payload geth pushes per WS notification.
  *
  * Each notification triggers the same guarded in-order pull the polling
  * tick uses ([[JsonRpcFeed.pullUpTo]] under the poll lock) bounded by the
  * ANNOUNCED height — so a burst of notifications backfills any gap
  * (missed heads while reconnecting are healed by the next head's pull; a
  * reorg mid-pull stops cleanly and the next head retries), duplicates are
  * no-ops against the cursor, and the bundle queue discipline is
  * bit-identical to the polling face. `eth_blockNumber` is never called on
  * the push path — heads arrive without any poll tick.
  *
  * On stream drop the subscriber thread reconnects after `reconnectMs`;
  * the server replaying its current head on (re)connect (as the stub and
  * any sane gateway do) makes the catch-up pull immediate.
  *
  * MULTI-NODE: one subscription stream per node, and a head delivered by
  * stream `i` REBINDS RPC affinity to node `i` before pulling — the
  * reference's multiclient affinity rule (the node that announced the
  * header serves the fetches; a peer that hasn't seen the block yet
  * can't return `null` into the ingest path). A node whose stream drops
  * just reconnects on its own schedule; heads keep flowing from the
  * others, and the duplicate announcements the healthy nodes produce are
  * no-ops against the shared cursor.
  */
class JsonRpcPushFeed(endpoints: Seq[String],
                      protected val subscribeUrls: Seq[String],
                      startBlock: Long,
                      httpTimeoutMs: Int,
                      reconnectMs: Long)
    extends JsonRpcFeed(endpoints, startBlock, httpTimeoutMs) {
  require(subscribeUrls.size == endpoints.size,
    "one subscribe URL per RPC endpoint (index-aligned)")

  def this(endpoint: String, subscribeUrl: String, startBlock: Long = 1L,
           httpTimeoutMs: Int = 30000, reconnectMs: Long = 200L) =
    this(Seq(endpoint), Seq(subscribeUrl), startBlock, httpTimeoutMs, reconnectMs)

  @volatile private var subThreads: List[Thread] = Nil

  /** Parse a notification line; malformed lines (keep-alive comments,
    * partial writes at disconnect) are skipped, not fatal.
    */
  protected def headNumber(line: String): Option[Long] = {
    val m = """"number"\s*:\s*"0x([0-9a-fA-F]+)"""".r.findFirstMatchIn(line)
    m.map(g => java.lang.Long.parseLong(g.group(1), 16))
  }

  /** One subscription connection against node `node`: block on the
    * chunked stream; every head rebinds affinity to `node` and pulls.
    * Returns when the server closes the stream; throws on transport
    * errors — the daemon loop handles both by reconnecting.
    */
  private[sources] def subscribeOnce(node: Int = 0): Unit = {
    val conn = URI.create(subscribeUrls(node)).toURL.openConnection().asInstanceOf[HttpURLConnection]
    try {
      conn.setRequestMethod("GET")
      conn.setConnectTimeout(httpTimeoutMs)
      conn.setReadTimeout(0) // the stream is idle between heads by design
      val rd = new BufferedReader(
        new InputStreamReader(conn.getInputStream, StandardCharsets.UTF_8))
      var line = rd.readLine()
      while (line != null && !Thread.currentThread().isInterrupted) {
        headNumber(line).foreach { h =>
          withPollLock {
            // affinity follows delivery: THIS node announced the head, so
            // THIS node serves the block/receipt fetches behind the pull
            rebindTo(node)
            pullUpTo(h)
          }
        }
        line = rd.readLine()
      }
    } finally conn.disconnect()
  }

  /** Background daemon subscribers, one per node — production mode, the
    * push analogue of [[JsonRpcFeed.startPolling]].
    */
  def startSubscription(): Unit = synchronized {
    if (subThreads.isEmpty) {
      subThreads = subscribeUrls.indices.map { node =>
        val t = new Thread(() => {
          while (!Thread.currentThread().isInterrupted) {
            try subscribeOnce(node)
            catch { case _: Exception => () } // dropped stream → reconnect
            try Thread.sleep(reconnectMs)
            catch { case _: InterruptedException => Thread.currentThread().interrupt() }
          }
        }, s"jsonrpc-feed-subscribe-$node")
        t.setDaemon(true)
        t.start()
        t
      }.toList
    }
  }

  def stopSubscription(): Unit = synchronized {
    subThreads.foreach(_.interrupt())
    subThreads = Nil
  }
}
