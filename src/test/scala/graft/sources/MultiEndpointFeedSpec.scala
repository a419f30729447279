package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import graft.chain.Fixtures._

/** Multi-node client affinity and failover — the reference's multiclient
  * notion (client/subscriber.go:28-31, indexer.go:148): N equivalent
  * nodes, RPC affinity follows whichever node delivered the head, and a
  * dead node neither stalls the feed nor keeps receiving fetches. No
  * Spark session needed: the adapter is driver-side plumbing.
  */
class MultiEndpointFeedSpec extends AnyFunSuite {

  private def eventually[A](what: String, timeoutMs: Long = 15000L)(cond: => Boolean): Unit = {
    val deadline = System.currentTimeMillis() + timeoutMs
    while (!cond) {
      assert(System.currentTimeMillis() < deadline, s"timed out waiting for $what")
      Thread.sleep(20)
    }
  }

  /** A TCP port with nothing listening — connects are refused, which is
    * the transport-failure shape the failover path must absorb. Bind-and-
    * release so the OS has just proven the port free.
    */
  private def deadPort(): Int = {
    val s = new java.net.ServerSocket(0)
    try s.getLocalPort finally s.close()
  }

  test("polling failover: a dead first endpoint fails over and affinity sticks to the survivor") {
    val main = bundleChain(1, 3, hash32(0), withTransferLogs = true)
    val live = new RpcStub
    live.setCanonical(main)
    val livePort = live.start()
    val dead = s"http://127.0.0.1:${deadPort()}/"
    try {
      val feed = new JsonRpcFeed(Seq(dead, s"http://127.0.0.1:$livePort/"),
        startBlock = 1L, httpTimeoutMs = 2000)
      assert(feed.activeEndpoint == dead)
      assert(feed.pollOnce() == 3, "the full backlog must arrive through the live node")
      assert(feed.range(0, 3).map(_.block.number) == Seq(1L, 2L, 3L))
      // sticky: the survivor holds affinity, so the dead node is never
      // retried on the next call (no per-call timeout tax)
      assert(feed.activeEndpoint == s"http://127.0.0.1:$livePort/")
    } finally live.stop()
  }

  test("push face: affinity follows the delivering node; killing one mid-stream keeps heads flowing") {
    val main = bundleChain(1, 5, hash32(0), withTransferLogs = true)
    val a = new RpcStub; val b = new RpcStub
    a.setCanonical(main.take(3)); b.setCanonical(main.take(3))
    val (portA, portB) = (a.start(), b.start())
    val (epA, epB) = (s"http://127.0.0.1:$portA/", s"http://127.0.0.1:$portB/")
    val feed = new JsonRpcPushFeed(
      Seq(epA, epB),
      Seq(s"$epA" + "subscribe", s"$epB" + "subscribe"),
      startBlock = 1L, httpTimeoutMs = 2000, reconnectMs = 100L)
    try {
      feed.startSubscription()
      eventually("both subscribers connect")(
        a.subscriberCount >= 1 && b.subscriberCount >= 1)

      // node A announces → A serves every fetch behind the pull; B none
      a.pushHead(main(2))
      eventually("backlog pull via A")(feed.latestSeq == 3L)
      assert(feed.activeEndpoint == epA)
      assert(a.blockByNumberCallCount == 3)
      assert(b.blockByNumberCallCount == 0,
        "fetches must go to the node that delivered the head")

      // node A dies mid-stream; B advances and announces — heads keep
      // arriving and affinity follows the live node
      a.stop()
      b.setCanonical(main)
      b.pushHead(main(4))
      eventually("heads keep flowing through B")(feed.latestSeq == 5L)
      assert(feed.activeEndpoint == epB)
      assert(feed.range(3, 5).map(_.block.number) == Seq(4L, 5L))
      assert(b.blockByNumberCallCount == 2)

      assert(a.blockNumberCallCount + b.blockNumberCallCount == 0,
        "the push path must never fall back to eth_blockNumber polling")
    } finally {
      feed.stopSubscription()
      b.stop()
    }
  }
}
