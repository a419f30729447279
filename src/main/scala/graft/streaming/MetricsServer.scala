package graft.streaming

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import java.net.InetSocketAddress

/** Plaintext metrics scrape endpoint — the ops surface the reference serves
  * when `--metrics` is set (cmd/indexer/root.go:106-121, default port
  * 9092): GET /metrics renders the [[IngestMetrics]] counters in the
  * Prometheus text exposition format, over the JDK's own HttpServer (no
  * codec or server dependency, same zero-dependency discipline as the RPC
  * feeds). Compose next to [[FullIngest.start]] exactly as the reference
  * composes its metrics listener next to the indexer loop:
  *
  * {{{
  * val m = new IngestMetrics
  * val srv = MetricsServer.start(m, port = 9092) // port 0 = ephemeral
  * val q = FullIngest.start(bundles, store, client, ckpt, metrics = Some(m))
  * // ... scrape http://host:9092/metrics ...
  * srv.close()
  * }}}
  *
  * Reads are lock-free snapshots of the driver-side atomics — a scrape
  * never takes a Spark job, never blocks the ingest loop.
  */
final class MetricsServer private (server: HttpServer) {
  /** The actually-bound port (differs from the requested one when 0). */
  def port: Int = server.getAddress.getPort
  def close(): Unit = server.stop(0)
}

object MetricsServer {

  def start(metrics: IngestMetrics, port: Int = 9092): MetricsServer =
    start(() => render(metrics), port)

  /** Generic face: serve any render thunk (the pipeline runner's metrics
    * are a different counter set than the chain indexer's).
    */
  def start(renderBody: () => String, port: Int): MetricsServer = {
    val server = HttpServer.create(new InetSocketAddress(port), 0)
    server.createContext("/metrics", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val body = renderBody().getBytes("UTF-8")
        try {
          ex.getResponseHeaders.set("Content-Type",
            "text/plain; version=0.0.4; charset=utf-8")
          ex.sendResponseHeaders(200, body.length.toLong)
          val os = ex.getResponseBody
          try os.write(body) finally os.close()
        } finally ex.close()
      }
    })
    server.setExecutor(null) // scrape traffic: serve on the dispatch thread
    server.start()
    new MetricsServer(server)
  }

  /** The Prometheus text form: `graft_`-prefixed counters/gauges plus the
    * `insert_block` latency histogram with cumulative `le` buckets — the
    * shape every scraper ingests natively. Kept in lockstep with
    * [[IngestMetrics.snapshot]] (the queryable-DataFrame face of the same
    * numbers).
    */
  def render(m: IngestMetrics): String = {
    val sb = new StringBuilder
    def num(v: Double): String =
      if (v == v.floor && math.abs(v) < 1e15) v.toLong.toString
      else "%.6f".formatLocal(java.util.Locale.ROOT, v)
    def metric(name: String, kind: String, v: Double): Unit = {
      sb.append("# TYPE ").append(name).append(' ').append(kind).append('\n')
      sb.append(name).append(' ').append(num(v)).append('\n')
    }
    metric("graft_new_block", "counter", m.newBlock.get().toDouble)
    metric("graft_reorg", "counter", m.reorg.get().toDouble)
    metric("graft_retracted_blocks", "counter", m.retractedBlocks.get().toDouble)
    metric("graft_new_subscription", "counter", m.newSubscription.get().toDouble)
    metric("graft_changed_account_per_block", "gauge",
      m.changedAccountPerBlock.get().toDouble)
    renderHistogram(sb, "graft_insert_block_seconds", m.insertBlock)
    sb.toString
  }

  /** One Prometheus histogram block (TYPE, cumulative `le` buckets incl.
    * +Inf, _sum, _count) — shared by every metrics face so the exposition
    * format can't drift between endpoints.
    */
  def renderHistogram(sb: StringBuilder, name: String, h: LatencyHistogram): Unit = {
    def num(v: Double): String =
      if (v == v.floor && math.abs(v) < 1e15) v.toLong.toString
      else "%.6f".formatLocal(java.util.Locale.ROOT, v)
    sb.append("# TYPE ").append(name).append(" histogram\n")
    val cumulative = h.bucketCounts.scanLeft(0L)(_ + _).tail
    h.bounds.zip(cumulative).foreach { case (b, c) =>
      sb.append(name).append("_bucket{le=\"").append(b)
        .append("\"} ").append(c).append('\n')
    }
    sb.append(name).append("_bucket{le=\"+Inf\"} ").append(cumulative.last).append('\n')
    sb.append(name).append("_sum ").append(num(h.sumSeconds)).append('\n')
    sb.append(name).append("_count ").append(h.count).append('\n'): Unit
  }
}
