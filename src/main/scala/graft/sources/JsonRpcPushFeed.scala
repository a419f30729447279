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
  */
final class JsonRpcPushFeed(endpoint: String, subscribeUrl: String,
                            startBlock: Long = 1L,
                            httpTimeoutMs: Int = 30000,
                            reconnectMs: Long = 200L)
    extends JsonRpcFeed(endpoint, startBlock, httpTimeoutMs) {

  @volatile private var subThread: Option[Thread] = None

  /** Parse a notification line; malformed lines (keep-alive comments,
    * partial writes at disconnect) are skipped, not fatal.
    */
  private def headNumber(line: String): Option[Long] = {
    val m = """"number"\s*:\s*"0x([0-9a-fA-F]+)"""".r.findFirstMatchIn(line)
    m.map(g => java.lang.Long.parseLong(g.group(1), 16))
  }

  /** One subscription connection: block on the chunked stream, pull on
    * every head. Returns when the server closes the stream; throws on
    * transport errors — the daemon loop handles both by reconnecting.
    */
  private[sources] def subscribeOnce(): Unit = {
    val conn = URI.create(subscribeUrl).toURL.openConnection().asInstanceOf[HttpURLConnection]
    try {
      conn.setRequestMethod("GET")
      conn.setConnectTimeout(httpTimeoutMs)
      conn.setReadTimeout(0) // the stream is idle between heads by design
      val rd = new BufferedReader(
        new InputStreamReader(conn.getInputStream, StandardCharsets.UTF_8))
      var line = rd.readLine()
      while (line != null && !Thread.currentThread().isInterrupted) {
        headNumber(line).foreach(h => withPollLock(pullUpTo(h)))
        line = rd.readLine()
      }
    } finally conn.disconnect()
  }

  /** Background daemon subscriber — production mode, the push analogue of
    * [[JsonRpcFeed.startPolling]].
    */
  def startSubscription(): Unit = synchronized {
    if (subThread.isEmpty) {
      val t = new Thread(() => {
        while (!Thread.currentThread().isInterrupted) {
          try subscribeOnce()
          catch { case _: Exception => () } // dropped stream → reconnect
          try Thread.sleep(reconnectMs)
          catch { case _: InterruptedException => Thread.currentThread().interrupt() }
        }
      }, "jsonrpc-feed-subscribe")
      t.setDaemon(true)
      t.start()
      subThread = Some(t)
    }
  }

  def stopSubscription(): Unit = synchronized {
    subThread.foreach(_.interrupt())
    subThread = None
  }
}
