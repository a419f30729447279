package graft.sources

import java.io.{BufferedInputStream, BufferedOutputStream}
import java.net.{InetAddress, ServerSocket, Socket}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.atomic.AtomicInteger
import org.scalatest.funsuite.AnyFunSuite
import graft.chain.Fixtures._
import graft.chain.Schemas.Bundle

/** Server half of RFC 6455, as a test stub: accepts the Upgrade, answers
  * the Sec-WebSocket-Accept derivation, pushes UNMASKED text frames
  * (server frames must not mask), reads the client's masked frames
  * (recording texts and pongs), and can ping. Deliberately independent
  * framing code from [[WebSocketClient]] — the spec is only meaningful if
  * the two ends don't share their bugs.
  */
final class WsStub {
  @volatile private var server: ServerSocket = _
  @volatile private var conns = List.empty[(Socket, BufferedOutputStream)]
  @volatile var lastText: String = ""
  val pongs = new AtomicInteger
  def subscriberCount: Int = conns.count(!_._1.isClosed)

  def start(tls: Option[javax.net.ssl.SSLServerSocketFactory] = None): Int = {
    server = tls.fold(new ServerSocket(0, 16, InetAddress.getByName("127.0.0.1")))(
      _.createServerSocket(0, 16, InetAddress.getByName("127.0.0.1")))
    val t = new Thread(() => {
      try while (true) {
        val s = server.accept()
        val h = new Thread(() => handle(s)); h.setDaemon(true); h.start()
      } catch { case _: Exception => () }
    })
    t.setDaemon(true); t.start()
    server.getLocalPort
  }

  private def handle(s: Socket): Unit = {
    try {
      val in  = new BufferedInputStream(s.getInputStream)
      val out = new BufferedOutputStream(s.getOutputStream)
      def line(): String = {
        val sb = new StringBuilder
        var c = in.read()
        while (c != -1 && c != '\n') { if (c != '\r') sb.append(c.toChar); c = in.read() }
        sb.toString
      }
      var key = ""
      var l = line()
      while (l.nonEmpty) {
        val i = l.indexOf(':')
        if (i > 0 && l.substring(0, i).equalsIgnoreCase("Sec-WebSocket-Key"))
          key = l.substring(i + 1).trim
        l = line()
      }
      out.write(("HTTP/1.1 101 Switching Protocols\r\n" +
        "Upgrade: websocket\r\nConnection: Upgrade\r\n" +
        s"Sec-WebSocket-Accept: ${WebSocketClient.acceptKey(key)}\r\n\r\n").getBytes(UTF_8))
      out.flush()
      conns = (s, out) :: conns
      // client-frame reader: masked text → lastText; pong → counter
      while (!s.isClosed) {
        val b0 = in.read(); if (b0 == -1) return
        val opcode = b0 & 0x0F
        val b1 = in.read(); if (b1 == -1) return
        var len = (b1 & 0x7F).toLong
        if (len == 126) len = (in.read() << 8) | in.read()
        else if (len == 127) { len = 0; (0 until 8).foreach(_ => len = (len << 8) | in.read()) }
        val mask = if ((b1 & 0x80) != 0) {
          val m = new Array[Byte](4); readFully(in, m); m
        } else null
        val p = new Array[Byte](len.toInt); readFully(in, p)
        if (mask != null) p.indices.foreach(i => p(i) = (p(i) ^ mask(i % 4)).toByte)
        opcode match {
          case 0x1 => lastText = new String(p, UTF_8)
          case 0xA => pongs.incrementAndGet()
          case 0x8 => return
          case _   => ()
        }
      }
    } catch { case _: Exception => () }
  }

  private def readFully(in: java.io.InputStream, dst: Array[Byte]): Unit = {
    var off = 0
    while (off < dst.length) {
      val n = in.read(dst, off, dst.length - off)
      if (n == -1) throw new java.io.EOFException
      off += n
    }
  }

  private def sendAll(opcode: Int, payload: Array[Byte]): Unit =
    conns.foreach { case (_, out) =>
      try out.synchronized {
        out.write(0x80 | opcode)
        val len = payload.length
        if (len < 126) out.write(len)
        else { out.write(126); out.write(len >> 8); out.write(len & 0xFF) }
        out.write(payload); out.flush()
      } catch { case _: Exception => () }
    }

  /** geth's real notification envelope — the head sits two levels deep. */
  def pushHead(b: Bundle): Unit = {
    val hx = "0x" + b.block.hash.map("%02x".format(_)).mkString
    sendAll(0x1, (s"""{"jsonrpc":"2.0","method":"eth_subscription","params":""" +
      s"""{"subscription":"0xcafe","result":{"number":"0x${java.lang.Long.toHexString(
        b.block.number)}","hash":"$hx"}}}""").getBytes(UTF_8))
  }

  def pingAll(): Unit = sendAll(0x9, "hb".getBytes(UTF_8))

  def stop(): Unit = {
    try server.close() catch { case _: Exception => () }
    conns.foreach { case (s, _) => try s.close() catch { case _: Exception => () } }
  }
}

/** The WS transport behind the push feed (client/subscriber.go:28-31):
  * same affinity/failover contract as MultiEndpointFeedSpec's HTTP push
  * face, now over real RFC 6455 framing — plus the protocol-level pieces
  * (accept-key validation, ping→pong, the geth notification envelope) the
  * chunked face never exercised.
  */
class WsFeedSpec extends AnyFunSuite {

  private def eventually(what: String, timeoutMs: Long = 15000L)(cond: => Boolean): Unit = {
    val deadline = System.currentTimeMillis() + timeoutMs
    while (!cond) {
      assert(System.currentTimeMillis() < deadline, s"timed out waiting for $what")
      Thread.sleep(20)
    }
  }

  test("ws push: subscribe frame sent, heads flow, affinity follows, one node dies") {
    val main = bundleChain(1, 5, hash32(0), withTransferLogs = true)
    val a = new RpcStub; val b = new RpcStub
    a.setCanonical(main.take(3)); b.setCanonical(main.take(3))
    val (rpcA, rpcB) = (a.start(), b.start())
    val wsA = new WsStub; val wsB = new WsStub
    val (wpA, wpB) = (wsA.start(), wsB.start())
    val feed = new JsonRpcWsFeed(
      Seq(s"http://127.0.0.1:$rpcA/", s"http://127.0.0.1:$rpcB/"),
      Seq(s"ws://127.0.0.1:$wpA/", s"ws://127.0.0.1:$wpB/"),
      startBlock = 1L, httpTimeoutMs = 2000, reconnectMs = 100L)
    try {
      feed.startSubscription()
      eventually("both WS subscribers connect")(
        wsA.subscriberCount >= 1 && wsB.subscriberCount >= 1)
      eventually("eth_subscribe request frame arrives")(
        wsA.lastText.contains("eth_subscribe") && wsA.lastText.contains("newHeads"))

      // node A announces over WS → A serves every fetch; B none
      wsA.pushHead(main(2))
      eventually("backlog pull via A")(feed.latestSeq == 3L)
      assert(feed.activeEndpoint == s"http://127.0.0.1:$rpcA/")
      assert(a.blockByNumberCallCount == 3)
      assert(b.blockByNumberCallCount == 0,
        "fetches must go to the node whose WS stream delivered the head")

      // ping mid-stream: the client must pong and keep consuming
      wsA.pingAll()
      eventually("client answers the ping")(wsA.pongs.get() >= 1)

      // kill node A entirely (WS + RPC); B advances and announces
      wsA.stop(); a.stop()
      b.setCanonical(main)
      wsB.pushHead(main(4))
      eventually("heads keep flowing through B")(feed.latestSeq == 5L)
      assert(feed.activeEndpoint == s"http://127.0.0.1:$rpcB/")
      assert(feed.range(3, 5).map(_.block.number) == Seq(4L, 5L))

      assert(a.blockNumberCallCount + b.blockNumberCallCount == 0,
        "the WS push path must never fall back to eth_blockNumber polling")
    } finally {
      feed.stopSubscription()
      wsB.stop(); b.stop()
    }
  }

  test("wss push over TLS: self-signed pinned CA, heads flow, one node dies") {
    val (serverSsl, clientCtx) = WsFeedSpec.tlsFixture
    val main = bundleChain(1, 5, hash32(0), withTransferLogs = true)
    val a = new RpcStub; val b = new RpcStub
    a.setCanonical(main.take(3)); b.setCanonical(main.take(3))
    val (rpcA, rpcB) = (a.start(), b.start())
    val wsA = new WsStub; val wsB = new WsStub
    val (wpA, wpB) = (wsA.start(Some(serverSsl)), wsB.start(Some(serverSsl)))
    // the deployment config face accepts the same URLs verbatim
    val cfg = graft.Indexer.parseConfig(
      s"""endpoints:
         |  - http://127.0.0.1:$rpcA/
         |ws:
         |  - wss://127.0.0.1:$wpA/
         |dataDir: /tmp/x
         |checkpointDir: /tmp/y
         |""".stripMargin)
    assert(cfg.wsUrls == Seq(s"wss://127.0.0.1:$wpA/"))
    val feed = new JsonRpcWsFeed(
      Seq(s"http://127.0.0.1:$rpcA/", s"http://127.0.0.1:$rpcB/"),
      Seq(s"wss://127.0.0.1:$wpA/", s"wss://127.0.0.1:$wpB/"),
      startBlock = 1L, httpTimeoutMs = 2000, reconnectMs = 100L,
      sslContext = Some(clientCtx))
    try {
      feed.startSubscription()
      eventually("both TLS subscribers connect")(
        wsA.subscriberCount >= 1 && wsB.subscriberCount >= 1)
      eventually("subscribe frame arrives over TLS")(
        wsA.lastText.contains("eth_subscribe"))
      wsA.pushHead(main(2))
      eventually("backlog pull via A")(feed.latestSeq == 3L)
      // kill node A (WS + RPC); B advances and announces over its TLS stream
      wsA.stop(); a.stop()
      b.setCanonical(main)
      wsB.pushHead(main(4))
      eventually("heads keep flowing through B")(feed.latestSeq == 5L)
      assert(feed.activeEndpoint == s"http://127.0.0.1:$rpcB/")
      assert(feed.range(3, 5).map(_.block.number) == Seq(4L, 5L))
    } finally {
      feed.stopSubscription()
      wsB.stop(); b.stop()
    }
  }

  test("wss against an UNTRUSTED cert is rejected at connect, not half-adopted") {
    val (serverSsl, _) = WsFeedSpec.tlsFixture
    val ws = new WsStub
    val port = ws.start(Some(serverSsl))
    try {
      // default JVM trust store does not contain the self-signed test CA
      intercept[java.io.IOException] {
        val c = new WebSocketClient(java.net.URI.create(s"wss://127.0.0.1:$port/"), 2000)
        try c.handshake() finally c.close()
      }
    } finally ws.stop()
  }

  test("handshake validation: a non-WS peer is rejected, not half-adopted") {
    // an HTTP server that answers 200 (no Upgrade): handshake must throw
    val srv = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    srv.createContext("/", (x: com.sun.net.httpserver.HttpExchange) => {
      x.sendResponseHeaders(200, -1); x.close()
    })
    srv.start()
    try {
      val ws = new WebSocketClient(
        java.net.URI.create(s"ws://127.0.0.1:${srv.getAddress.getPort}/"), 2000)
      try intercept[java.io.IOException](ws.handshake()) finally ws.close()
    } finally srv.stop(0)
  }

  test("fragmented text frames reassemble into one notification") {
    // hand-roll a server that splits one notification across two frames
    val server = new ServerSocket(0, 4, InetAddress.getByName("127.0.0.1"))
    val payload = """{"params":{"result":{"number":"0x2a"}}}"""
    val t = new Thread(() => {
      val s = server.accept()
      val in = new BufferedInputStream(s.getInputStream)
      val out = new BufferedOutputStream(s.getOutputStream)
      def line(): String = {
        val sb = new StringBuilder; var c = in.read()
        while (c != -1 && c != '\n') { if (c != '\r') sb.append(c.toChar); c = in.read() }
        sb.toString
      }
      var key = ""; var l = line()
      while (l.nonEmpty) {
        if (l.toLowerCase.startsWith("sec-websocket-key:")) key = l.substring(18).trim
        l = line()
      }
      out.write(("HTTP/1.1 101 Switching Protocols\r\nUpgrade: websocket\r\n" +
        "Connection: Upgrade\r\n" +
        s"Sec-WebSocket-Accept: ${WebSocketClient.acceptKey(key)}\r\n\r\n").getBytes(UTF_8))
      val (p1, p2) = payload.getBytes(UTF_8).splitAt(10)
      out.write(0x01); out.write(p1.length); out.write(p1) // text, FIN=0
      out.write(0x80); out.write(p2.length); out.write(p2) // continuation, FIN=1
      out.flush()
    })
    t.setDaemon(true); t.start()
    val ws = new WebSocketClient(
      java.net.URI.create(s"ws://127.0.0.1:${server.getLocalPort}/"), 2000)
    try {
      ws.handshake()
      assert(ws.readText().contains(payload))
    } finally { ws.close(); server.close() }
  }
}

object WsFeedSpec {
  /** Self-signed TLS fixture, generated OFFLINE by the JDK's own keytool:
    * a PKCS12 keypair for CN/SAN 127.0.0.1 → (server socket factory,
    * client SSLContext trusting exactly that cert). The client context
    * still runs full JSSE verification INCLUDING endpoint identification —
    * the SAN must name 127.0.0.1 or the handshake fails — so the test
    * exercises the same code path as a public `wss://` endpoint.
    */
  lazy val tlsFixture: (javax.net.ssl.SSLServerSocketFactory, javax.net.ssl.SSLContext) = {
    import java.security.KeyStore
    import javax.net.ssl._
    val dir    = java.nio.file.Files.createTempDirectory("graft-wss-ks")
    val ksPath = dir.resolve("server.p12").toString
    val keytool = new ProcessBuilder(
      System.getProperty("java.home") + "/bin/keytool",
      "-genkeypair", "-alias", "ws", "-keyalg", "RSA", "-keysize", "2048",
      "-dname", "CN=127.0.0.1", "-validity", "2",
      "-keystore", ksPath, "-storetype", "PKCS12", "-storepass", "changeit",
      "-ext", "san=ip:127.0.0.1").redirectErrorStream(true).start()
    val log = new String(keytool.getInputStream.readAllBytes(), UTF_8)
    require(keytool.waitFor() == 0, s"keytool failed:\n$log")
    val ks = KeyStore.getInstance("PKCS12")
    val in = java.nio.file.Files.newInputStream(java.nio.file.Paths.get(ksPath))
    try ks.load(in, "changeit".toCharArray) finally in.close()
    val kmf = KeyManagerFactory.getInstance(KeyManagerFactory.getDefaultAlgorithm)
    kmf.init(ks, "changeit".toCharArray)
    val serverCtx = SSLContext.getInstance("TLS")
    serverCtx.init(kmf.getKeyManagers, null, null)
    val trust = KeyStore.getInstance(KeyStore.getDefaultType)
    trust.load(null, null)
    trust.setCertificateEntry("ws", ks.getCertificate("ws"))
    val tmf = TrustManagerFactory.getInstance(TrustManagerFactory.getDefaultAlgorithm)
    tmf.init(trust)
    val clientCtx = SSLContext.getInstance("TLS")
    clientCtx.init(null, tmf.getTrustManagers, null)
    (serverCtx.getServerSocketFactory, clientCtx)
  }
}
