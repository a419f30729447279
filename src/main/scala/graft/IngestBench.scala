package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import graft.chain._
import graft.chain.Fixtures._
import graft.chain.Schemas._
import graft.streaming.{BalanceIngest, BundleStream, BundleStreamProvider,
  ChainIngest, FullIngest, HeadSubscriptions, IngestMetrics, QueueHeadSubscription}

/** Ingest-path benchmark: blocks/sec through the composed [[FullIngest]]
  * lifecycle — the analogue of the reference's single published perf
  * surface, the `insert_block` latency histogram
  * (service/indexer/indexer.go:64,164-165).
  *
  * Two cases over the same synthetic workload (active subscription set,
  * per-block txs + transfer logs, one admission event block at the start
  * and one token-seed event block mid-span, quiet spans between):
  *   - **catch-up**: ONE `processBatch` carrying the whole span — the
  *     backfill mode where the quiet-span vectorization (one windowed DAG
  *     per span instead of ~12 Spark jobs per block) is supposed to pay;
  *   - **head-follow**: one `processBatch` PER BLOCK — the steady-state
  *     tip-following mode, and the per-block-loop baseline the
  *     vectorization is measured against. Its `insert_block` histogram is
  *     the per-block latency distribution the reference records.
  *
  * Both rates are medians over `trials` full runs against fresh stores.
  * Invoked from [[Bench]] after the query inventory; results land in the
  * bench_out.json FILE artifact only (the size-bounded stdout line is
  * unchanged).
  *
  * Reading the numbers: per-block mode pays ~50 Spark-job launches +
  * parquet commits PER BLOCK, so its rate is flat (~0.15 blocks/s at
  * local[4] regardless of span). Catch-up throughput GROWS with span
  * length — the span costs O(1) jobs — so the reported blocks/sec is a
  * floor that improves as the backfill deepens (40→240 blocks already
  * moves 1.9→8.7 blocks/s; a million-block backfill amortizes to chain
  * chunking alone). The default sizes hold the whole measurement near
  * ~3.5 min so the driver's bench stays inside its window.
  */
object IngestBench {

  /** Standalone entry for iterating on the ingest measurement alone —
    * the driver's bench path is [[Bench.main]], which embeds [[run]]'s
    * fragment in bench_out.json.
    */
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    println("{" + run(spark) + "}")
    spark.stop()
  }

  /** Deterministic balance client — balance = f(address, block hash), the
    * same contract as the specs' fixture client: the bench measures the
    * pipeline, not an RPC round-trip.
    */
  final class SyntheticClient extends BalanceClient {
    def balances(blockHash: Array[Byte],
                 pairs: Seq[(Array[Byte], Array[Byte])]): Seq[String] =
      pairs.map { case (_, a) =>
        ((BigInt(1, a) % BigInt(10).pow(20)) + (blockHash(0) & 0xff).toLong).toString
      }
  }

  private def mkStore(spark: SparkSession): TableStore =
    TableStore(spark, Files.createTempDirectory("graft-ingest-bench").toString,
      bucketSize = 64L)

  /** N blocks, each carrying two subscribed-address txs mirrored as eth
    * transfer logs — every block does real balance work (changed-set,
    * resolver, fees, totals).
    */
  private def mkChain(n: Long): Seq[Bundle] = {
    val txsAt = (1L to n).map { i =>
      i -> Seq(
        tx((2 * i).toInt, alice, carol, 500, gasPrice = 100L),
        tx((2 * i + 1).toInt, bob, alice, 300, gasPrice = 90L))
    }.toMap
    bundleChain(1, n, hash32(0), txsAt = txsAt, withTransferLogs = true)
  }

  /** alice active from genesis; bob and carol PENDING (block 1 becomes an
    * admission event block); tokenX seeds mid-span (a second event block)
    * — so the span exercises both event brackets and the quiet spans
    * between them.
    */
  private def seedWorld(spark: SparkSession, store: TableStore, n: Long): Unit = {
    import spark.implicits._
    store.replace(BalanceIngest.SubsTable,
      Seq((1L, 1L, 1L, alice), (2L, 0L, 2L, bob), (3L, 0L, 2L, carol))
        .toDF("id", "block_number", "group", "address"))
    store.replace(BalanceIngest.RegistryTable,
      Seq((tokenX, n / 2 + 1, 18, "TOK"))
        .toDF("address", "block_number", "decimals", "name"))
  }

  private def timed(f: => Unit): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  /** One full catch-up run: fresh store, whole chain in one micro-batch. */
  private def catchUp(spark: SparkSession, n: Long, client: BalanceClient,
                      m: IngestMetrics): Double = {
    import spark.implicits._
    val store = mkStore(spark)
    seedWorld(spark, store, n)
    val batch = mkChain(n).toDS().toDF()
    timed(FullIngest.processBatch(spark, store, batch, client, metrics = Some(m)))
  }

  /** One full head-follow run: fresh store, one micro-batch per block. */
  private def headFollow(spark: SparkSession, n: Long, client: BalanceClient,
                         m: IngestMetrics): Double = {
    import spark.implicits._
    val store = mkStore(spark)
    seedWorld(spark, store, n)
    val bundles = mkChain(n)
    timed(bundles.foreach { b =>
      FullIngest.processBatch(spark, store, Seq(b).toDS().toDF(), client,
        metrics = Some(m))
    })
  }

  /** Run both cases `trials` times; returns the JSON fragment for the
    * bench file artifact. The histogram reported is head-follow's —
    * per-block insert latencies, the reference's metric shape.
    */
  /** Spark-job counter for attribution: scheduling overhead, not data
    * volume, is what bounds the per-block bracket (dozens of sub-second
    * jobs per block), so the floor is only explainable WITH the job count.
    */
  private final class JobCounter extends org.apache.spark.scheduler.SparkListener {
    val jobs = new java.util.concurrent.atomic.AtomicLong
    override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
      jobs.incrementAndGet()
  }

  private def countingJobs(spark: SparkSession)(f: => Unit): Long = {
    val c = new JobCounter
    spark.sparkContext.addSparkListener(c)
    // the listener bus is async; a beat before detaching lets the tail of
    // the event queue drain (counts are attribution telemetry — a ±1 race
    // would not change what they attribute)
    try { f; Thread.sleep(500) }
    finally spark.sparkContext.removeSparkListener(c)
    c.jobs.get
  }

  /** Backfill→head-follow HANDOFF — the deployment-shaped scenario the two
    * isolated modes above don't cover: a real indexer starts months behind
    * tip (the reference's `syncTo` 50-block stepping,
    * service/indexer/indexer.go:218-246). Fresh store, a feed already
    * announcing `behind` blocks, and the REAL streaming query (DSv2 source
    * under its `maxblockspertrigger` ReadLimit): time-to-tip measures the
    * chunked catch-up, the chunk count proves the throttle actually stepped
    * (≈ behind/chunk non-empty micro-batches, never one giant batch), and
    * `heads` single-head pushes through the SAME running query — no
    * restart, no new checkpoint — measure the steady cadence the throttle
    * hands off to. Returns (catchupSec, chunkBatches, medianHeadSec).
    */
  private def catchUpToTip(spark: SparkSession, behind: Long, heads: Int,
                           chunk: Int, client: BalanceClient): (Double, Long, Double) = {
    import spark.implicits._
    val store = mkStore(spark)
    seedWorld(spark, store, behind)
    val sub   = new QueueHeadSubscription
    val subId = s"ingest-bench-${java.util.UUID.randomUUID()}"
    HeadSubscriptions.register(subId, sub)
    val chain = mkChain(behind + heads)
    sub.push(chain.take(behind.toInt): _*) // the announced tip sits `behind` ahead
    val bundles = spark.readStream
      .format(classOf[BundleStreamProvider].getName)
      .option(BundleStream.SubscriptionOption, subId)
      .option(BundleStream.MaxBlocksOption, chunk.toString)
      .load()
    val ckpt = Files.createTempDirectory("graft-ingest-tip-ckpt").toString
    val q = FullIngest.start(bundles, store, client, ckpt,
      maxBlocksPerChunk = chunk, fetchBack = sub.byHash)
    try {
      val tCatch = timed(q.processAllAvailable())
      require(ChainIngest.loadHead(store).exists(_.number == behind),
        s"catch-up did not reach the announced tip $behind")
      val chunks = q.recentProgress.count(_.numInputRows > 0).toLong
      val perHead = (0 until heads).map { i =>
        sub.push(chain(behind.toInt + i))
        timed(q.processAllAvailable())
      }
      require(ChainIngest.loadHead(store).exists(_.number == behind + heads),
        "head-follow did not advance past the handoff")
      (tCatch, chunks, median(perHead))
    } finally q.stop()
  }

  private def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.length / 2)

  def run(spark: SparkSession,
          spanBlocks: Long = sys.env.get("SPARK_GRAFT_INGEST_SPAN").map(_.toLong).getOrElse(240L),
          perBlockBlocks: Long = sys.env.get("SPARK_GRAFT_INGEST_PERBLOCK").map(_.toLong).getOrElse(6L),
          trials: Int = sys.env.get("SPARK_GRAFT_BENCH_TRIALS").map(_.toInt).getOrElse(3)): String = {
    val client = new SyntheticClient
    // warm codegen/classloading on tiny runs so trial 1 isn't a compile
    catchUp(spark, 4L, client, new IngestMetrics)
    headFollow(spark, 2L, client, new IngestMetrics)

    val spanTimes = scala.collection.mutable.ArrayBuffer.empty[Double]
    val spanJobs = countingJobs(spark) {
      (1 to trials).foreach(_ =>
        spanTimes += catchUp(spark, spanBlocks, client, new IngestMetrics))
    }
    val histogram = new IngestMetrics // per-block latencies accumulate across trials
    val blockTimes = scala.collection.mutable.ArrayBuffer.empty[Double]
    val blockJobs = countingJobs(spark) {
      (1 to trials).foreach(_ =>
        blockTimes += headFollow(spark, perBlockBlocks, client, histogram))
    }

    val spanRate  = spanBlocks / median(spanTimes.toSeq)
    val blockRate = perBlockBlocks / median(blockTimes.toSeq)
    val jobsPerBlock = blockJobs.toDouble / (trials * perBlockBlocks)
    val h = histogram.insertBlock
    def f(v: Double): String = "%.2f".formatLocal(java.util.Locale.ROOT, v)
    val buckets = h.bounds.zip(h.bucketCounts.scanLeft(0L)(_ + _).tail)
      .map { case (b, c) => "\"le_" + b + "\":" + c }.mkString(",")
    val behind = sys.env.get("SPARK_GRAFT_INGEST_BEHIND").map(_.toLong).getOrElse(200L)
    val (tipSec, tipChunks, headSec) =
      catchUpToTip(spark, behind, heads = 5, chunk = 50, client = client)

    s""""ingest_blocks_per_sec":${f(spanRate)},""" +
      s""""ingest_blocks_per_sec_perblock":${f(blockRate)},""" +
      s""""ingest_span_blocks":$spanBlocks,"ingest_perblock_blocks":$perBlockBlocks,""" +
      s""""ingest_span_sec":[${spanTimes.sorted.map(f).mkString(",")}],""" +
      s""""ingest_perblock_sec":[${blockTimes.sorted.map(f).mkString(",")}],""" +
      s""""ingest_span_jobs":$spanJobs,""" +
      s""""ingest_perblock_jobs_per_block":${f(jobsPerBlock)},""" +
      s""""ingest_catchup_to_tip_sec":${f(tipSec)},""" +
      s""""ingest_catchup_behind_blocks":$behind,""" +
      s""""ingest_catchup_chunks":$tipChunks,""" +
      s""""ingest_handoff_head_sec":${f(headSec)},""" +
      s""""insert_block_hist":{"count":${h.count},"avg_sec":${f(
        if (h.count == 0) 0.0 else h.sumSeconds / h.count)},""" +
      s""""min_sec":${f(h.minSeconds)},"max_sec":${f(h.maxSeconds)},$buckets}"""
  }
}
