package graft.chain

import java.util.concurrent.Executors
import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration

/** Concurrent execution of INDEPENDENT store actions from the driver.
  *
  * The per-block ingest bracket is bounded by Spark job-launch latency,
  * not data volume: a head-follow block issues a dozen sub-second write
  * jobs (distinct tables, no ordering between them) back-to-back, and
  * each one leaves the cluster idle while the driver schedules the next.
  * Submitting the independent jobs from separate threads overlaps their
  * scheduling + commit latency — Spark supports concurrent jobs on one
  * SparkContext by design (the FIFO scheduler interleaves them), and at
  * 1000-executor scale this same overlap is what keeps a tiny-batch
  * streaming trigger from serializing on the driver.
  *
  * Failure contract: the first failure propagates to the caller (the
  * sibling actions may still be in flight — every caller wraps the
  * bracket in a replay-idempotent delete-then-append, so a partial
  * bracket converges on replay exactly like a crash there would).
  *
  * A dedicated pool, not the global ExecutionContext: store actions BLOCK
  * on Spark job completion, and blocking the global fork-join pool from
  * inside Spark (whose own code also uses it) invites starvation.
  */
object Par {
  private lazy val pool = ExecutionContext.fromExecutorService(
    Executors.newFixedThreadPool(8, r => {
      val t = new Thread(r, "graft-store-par")
      t.setDaemon(true)
      t
    }))

  /** Run the thunks concurrently; returns when ALL have completed (or the
    * first failure has propagated). Single-element and empty input run
    * inline — no pool round-trip for the common tiny case.
    */
  def run(thunks: Seq[() => Unit]): Unit =
    if (thunks.lengthCompare(1) <= 0) thunks.foreach(_.apply())
    else {
      implicit val ec: ExecutionContext = pool
      Await.result(Future.sequence(thunks.map(t => Future(t()))), Duration.Inf): Unit
    }
}
