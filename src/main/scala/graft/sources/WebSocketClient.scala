package graft.sources

import java.io.{BufferedInputStream, BufferedOutputStream, Closeable, EOFException, IOException}
import java.net.{InetSocketAddress, Socket, URI}
import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest
import java.util.Base64

/** Minimal RFC 6455 WebSocket CLIENT over a plain `java.net.Socket` — the
  * transport the reference actually speaks to geth's `newHeads`
  * subscription (client/subscriber.go:28-31 dials `ws://`). Pure JDK, the
  * feed-adapter discipline: no codec or client library exists in this
  * container, and the protocol subset a JSON-RPC subscription needs is
  * small — the opening handshake (Sec-WebSocket-Key/-Accept validation),
  * masked client frames (the RFC REQUIRES clients to mask), unmasked
  * server frames with 7/16/64-bit lengths, text-fragment reassembly, and
  * the ping→pong / close control behavior.
  *
  * `wss://` layers JSSE TLS over the same socket (every real public
  * endpoint — and geth behind any ingress — terminates TLS at the node,
  * which is also what the reference dials: its multiclient passes the URL
  * scheme straight to go-ethereum's dialer). The default `SSLContext`
  * verifies the chain against the JVM trust store AND the hostname
  * (endpoint identification is explicitly enabled — JSSE's raw
  * SSLSocket default checks the chain but not that the cert names this
  * host); pass `sslContext` to pin a private CA. No extensions, no
  * outbound fragmentation.
  */
final class WebSocketClient(uri: URI, connectTimeoutMs: Int,
                            sslContext: Option[javax.net.ssl.SSLContext] = None)
    extends Closeable {
  private val tls = uri.getScheme == "wss"
  require(uri.getScheme == "ws" || tls, s"only ws:// or wss:// URIs (got $uri)")
  private val port = if (uri.getPort != -1) uri.getPort else if (tls) 443 else 80

  private val socket: Socket = {
    val plain = new Socket()
    plain.connect(new InetSocketAddress(uri.getHost, port), connectTimeoutMs)
    if (!tls) plain
    else {
      val factory = sslContext.map(_.getSocketFactory).getOrElse(
        javax.net.ssl.SSLSocketFactory.getDefault
          .asInstanceOf[javax.net.ssl.SSLSocketFactory])
      val ssl = factory.createSocket(plain, uri.getHost, port, true)
        .asInstanceOf[javax.net.ssl.SSLSocket]
      val params = ssl.getSSLParameters
      params.setEndpointIdentificationAlgorithm("HTTPS")
      ssl.setSSLParameters(params)
      ssl.startHandshake() // fail fast: a bad cert must poison connect, not first read
      ssl
    }
  }
  socket.setSoTimeout(0) // a subscription stream is idle between heads
  socket.setTcpNoDelay(true)
  private val in  = new BufferedInputStream(socket.getInputStream)
  private val out = new BufferedOutputStream(socket.getOutputStream)
  private val rnd = new java.security.SecureRandom()

  /** Opening handshake (RFC 6455 §4): HTTP Upgrade with a random key, and
    * the 101 response's Sec-WebSocket-Accept MUST equal
    * base64(sha1(key + magic GUID)) — a mismatch means the peer is not a
    * WebSocket endpoint and the connection is poisoned.
    */
  def handshake(): Unit = {
    val keyBytes = new Array[Byte](16)
    rnd.nextBytes(keyBytes)
    val key  = Base64.getEncoder.encodeToString(keyBytes)
    val path = if (uri.getRawPath == null || uri.getRawPath.isEmpty) "/" else uri.getRawPath
    val req =
      s"GET $path HTTP/1.1\r\n" +
        s"Host: ${uri.getHost}:$port\r\n" +
        "Upgrade: websocket\r\n" +
        "Connection: Upgrade\r\n" +
        s"Sec-WebSocket-Key: $key\r\n" +
        "Sec-WebSocket-Version: 13\r\n\r\n"
    out.write(req.getBytes(UTF_8)); out.flush()

    val status = readHttpLine()
    if (!status.startsWith("HTTP/1.1 101"))
      throw new IOException(s"websocket handshake refused: $status")
    var accept: Option[String] = None
    var line = readHttpLine()
    while (line.nonEmpty) {
      val i = line.indexOf(':')
      if (i > 0 && line.substring(0, i).equalsIgnoreCase("Sec-WebSocket-Accept"))
        accept = Some(line.substring(i + 1).trim)
      line = readHttpLine()
    }
    if (!accept.contains(WebSocketClient.acceptKey(key)))
      throw new IOException(s"bad Sec-WebSocket-Accept (got $accept)")
  }

  private def readHttpLine(): String = {
    val sb = new StringBuilder
    var c = in.read()
    while (c != -1 && c != '\n') { if (c != '\r') sb.append(c.toChar); c = in.read() }
    if (c == -1) throw new EOFException("connection closed during handshake")
    sb.toString
  }

  /** Send a TEXT frame (client frames are always masked, RFC 6455 §5.3). */
  def sendText(payload: String): Unit = sendFrame(0x1, payload.getBytes(UTF_8))

  private def sendPong(payload: Array[Byte]): Unit = sendFrame(0xA, payload)
  private def sendClose(): Unit = sendFrame(0x8, Array.emptyByteArray)

  private def sendFrame(opcode: Int, payload: Array[Byte]): Unit = synchronized {
    out.write(0x80 | opcode) // FIN + opcode
    val len = payload.length
    if (len < 126) out.write(0x80 | len)
    else if (len < 65536) {
      out.write(0x80 | 126); out.write(len >> 8); out.write(len & 0xFF)
    } else {
      out.write(0x80 | 127)
      var i = 7
      while (i >= 0) { out.write(((len.toLong >> (8 * i)) & 0xFF).toInt); i -= 1 }
    }
    val mask = new Array[Byte](4)
    rnd.nextBytes(mask)
    out.write(mask)
    var i = 0
    while (i < len) { out.write(payload(i) ^ mask(i % 4)); i += 1 }
    out.flush()
  }

  /** Next complete TEXT message, transparently answering pings and
    * reassembling fragments; None when the peer closes (close frame or
    * EOF). Server-to-client frames are unmasked per the RFC, but a masked
    * frame from a non-compliant peer is unmasked rather than rejected.
    */
  def readText(): Option[String] = {
    val buf = new java.io.ByteArrayOutputStream()
    var inText = false
    while (true) {
      val b0 = in.read()
      if (b0 == -1) return None
      val fin    = (b0 & 0x80) != 0
      val opcode = b0 & 0x0F
      val b1 = in.read()
      if (b1 == -1) return None
      val masked = (b1 & 0x80) != 0
      var len: Long = b1 & 0x7F
      if (len == 126) len = (readByte() << 8) | readByte()
      else if (len == 127) {
        len = 0
        var i = 0
        while (i < 8) { len = (len << 8) | readByte(); i += 1 }
      }
      if (len > WebSocketClient.MaxFrameBytes)
        throw new IOException(s"frame of $len bytes exceeds the subscription-payload cap")
      val mask = if (masked) { val m = new Array[Byte](4); readFully(m); m } else null
      val payload = new Array[Byte](len.toInt)
      readFully(payload)
      if (mask != null) {
        var i = 0
        while (i < payload.length) { payload(i) = (payload(i) ^ mask(i % 4)).toByte; i += 1 }
      }
      opcode match {
        case 0x1 => // text
          buf.write(payload)
          if (fin) return Some(new String(buf.toByteArray, UTF_8))
          inText = true
        case 0x0 => // continuation
          if (inText) {
            buf.write(payload)
            if (fin) return Some(new String(buf.toByteArray, UTF_8))
          }
        case 0x9 => sendPong(payload) // ping
        case 0xA => ()                // unsolicited pong: ignore
        case 0x8 => return None       // close
        case _   => ()                // binary/reserved: a JSON-RPC peer never sends these
      }
    }
    None
  }

  private def readByte(): Long = {
    val c = in.read()
    if (c == -1) throw new EOFException("connection closed mid-frame")
    c.toLong
  }

  private def readFully(dst: Array[Byte]): Unit = {
    var off = 0
    while (off < dst.length) {
      val n = in.read(dst, off, dst.length - off)
      if (n == -1) throw new EOFException("connection closed mid-frame")
      off += n
    }
  }

  override def close(): Unit = {
    try sendClose() catch { case _: Exception => () }
    try socket.close() catch { case _: Exception => () }
  }
}

object WebSocketClient {
  /** RFC 6455 §1.3 accept-key derivation — shared with any server stub. */
  val MagicGuid = "258EAFA5-E914-47DA-95CA-C5AB0DC85B11"
  def acceptKey(key: String): String =
    Base64.getEncoder.encodeToString(
      MessageDigest.getInstance("SHA-1").digest((key + MagicGuid).getBytes(UTF_8)))

  /** Subscription notifications are head headers — a frame past this size
    * is a protocol violation, not a bigger head (bounds the allocation a
    * hostile peer can force).
    */
  val MaxFrameBytes: Long = 1L << 20
}
