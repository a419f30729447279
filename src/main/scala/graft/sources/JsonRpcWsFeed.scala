package graft.sources

import java.net.URI

/** The push feed over REAL WebSocket transport — the wire the reference
  * actually dials for `newHeads` (client/subscriber.go:28-31 via
  * go-ethereum's `ethclient.Dial` on a `ws://` URL): RFC 6455 handshake +
  * framing ([[WebSocketClient]]), an `eth_subscribe(["newHeads"])` request
  * frame, then one notification per pushed head.
  *
  * Everything EXCEPT the transport is [[JsonRpcPushFeed]], inherited
  * unchanged: the per-node daemon/reconnect loop, the affinity rule (the
  * node whose stream delivered the head serves the fetches), the
  * announced-height-bounded in-order pull under the poll lock, and the
  * never-poll guarantee. That is the point of the `HeadSubscription` seam —
  * swapping chunked HTTP for WS is exactly one method.
  *
  * Notification parsing reuses the same tolerant `"number":"0x…"` scan:
  * geth wraps the header in
  * `{"jsonrpc":"2.0","method":"eth_subscription","params":{"result":{…}}}`,
  * and the subscription-confirmation reply (`"result":"0x<subId>"`)
  * carries no `"number"` field, so it is skipped naturally.
  */
final class JsonRpcWsFeed(endpoints: Seq[String], wsUrls: Seq[String],
                          startBlock: Long,
                          httpTimeoutMs: Int,
                          reconnectMs: Long,
                          // None = the JVM default trust store (real `wss://`
                          // endpoints); Some = a pinned private CA
                          sslContext: Option[javax.net.ssl.SSLContext] = None)
    extends JsonRpcPushFeed(endpoints, wsUrls, startBlock, httpTimeoutMs, reconnectMs) {

  def this(endpoint: String, wsUrl: String, startBlock: Long,
           httpTimeoutMs: Int, reconnectMs: Long) =
    this(Seq(endpoint), Seq(wsUrl), startBlock, httpTimeoutMs, reconnectMs, None)

  override private[sources] def subscribeOnce(node: Int): Unit = {
    val ws = new WebSocketClient(URI.create(subscribeUrls(node)), httpTimeoutMs, sslContext)
    try {
      ws.handshake()
      ws.sendText(
        """{"jsonrpc":"2.0","id":1,"method":"eth_subscribe","params":["newHeads"]}""")
      var msg = ws.readText()
      while (msg.isDefined && !Thread.currentThread().isInterrupted) {
        headNumber(msg.get).foreach { h =>
          withPollLock {
            // affinity follows delivery, exactly as the HTTP push face
            rebindTo(node)
            pullUpTo(h)
          }
        }
        msg = ws.readText()
      }
    } finally ws.close()
  }
}
