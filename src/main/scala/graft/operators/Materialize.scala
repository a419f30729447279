package graft.operators

import org.apache.spark.sql.DataFrame

/** Size-aware pivot materialization — the one seam every multi-consumer
  * intermediate goes through.
  *
  * Catalyst expands (never dedupes) shared subtrees, so a relation with N
  * consumers re-runs its upstream N times unless it is materialized once;
  * `localCheckpoint(true)` is the materialization of choice here
  * (MEMORY_AND_DISK blocks, ContextCleaner-reclaimed — `persist` would pin
  * a CacheManager entry for the session lifetime). But localCheckpoint is
  * NON-REPLAYABLE executor-local storage: past a certain payload size the
  * trade inverts — a corpus-scale write to executor storage per run, and
  * one lost executor fails the job instead of recomputing (guide §5). So:
  *
  *   - `persist = false` (caller opt-out, the `persistIntermediates`
  *     escape hatch): return the plan untouched — lazy, pure,
  *     fault-tolerant lineage;
  *   - estimated payload above `spark.graft.pivot.maxBytes` (default
  *     8 GiB): same — at that size recomputing per consumer from
  *     replayable sources beats materializing to non-replayable storage,
  *     and the estimate (Catalyst's optimized-plan sizeInBytes, which
  *     scales with the scanned input) is exactly what distinguishes a
  *     test-scale run from the 100 TB run;
  *   - otherwise: eager localCheckpoint, the round-17 discipline.
  *
  * Enable the valve ONLY for scan-shaped plans (scan → filter/project/
  * explode [→ semi-join]) whose size estimate is sane; join-heavy plans
  * without CBO statistics estimate as child-size products and would trip
  * the valve spuriously — those sites pass `valve = false` (their
  * payloads are small by construction: bucket counts, registers,
  * histograms) and keep only the persist flag.
  */
object Materialize {

  val MaxBytesKey = "spark.graft.pivot.maxBytes"
  val DefaultMaxBytes: Long = 8L << 30 // 8 GiB of estimated payload

  def pivot(df: DataFrame, persist: Boolean = true, valve: Boolean = true): DataFrame = {
    if (!persist) return df
    if (valve) {
      val maxBytes =
        try df.sparkSession.conf.get(MaxBytesKey, DefaultMaxBytes.toString).toLong
        catch { case _: Throwable => DefaultMaxBytes }
      val estimated =
        try df.queryExecution.optimizedPlan.stats.sizeInBytes
        catch { case _: Throwable => BigInt(0) } // unestimable → materialize
      if (estimated > maxBytes) return df
    }
    df.localCheckpoint(true)
  }
}
