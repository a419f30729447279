package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Core relational operators the reference engine expresses by hand-written
  * SQL or Go maps, re-expressed as declarative Spark plans.
  *
  * Scale notes (100 TB): each helper is a single shuffle (or none); nothing
  * collects to the driver; window partitions are keyed so skew falls on the
  * natural entity key (address / user), which AQE can split further.
  */
object Relational {

  /** Latest row per key — the reference's greatest-n-per-group self-join
    * (`/root/reference/store/account/account.go:187-209`, J1/W1) expressed
    * as one window: a single hash-partition shuffle on `keys`, no join.
    *
    * `order` must be a total order within a key (pass a unique tiebreaker)
    * so results are deterministic.
    */
  def latestPerKey(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order.map(_.desc): _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Top-n rows per key (generalization of latestPerKey). */
  def topNPerKey(df: DataFrame, keys: Seq[String], order: Seq[Column], n: Int): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order.map(_.desc): _*)
    df.withColumn("rank_in_key", row_number().over(w))
      .filter(col("rank_in_key") <= n)
  }

  /** As-of (point-in-time) join — the reference's
    * `WHERE address = k AND block_number <= n ORDER BY block_number DESC
    * LIMIT 1` probed per key (`store/account/account.go:64,175-185`, J5).
    *
    * Union-window formulation: tag both sides, union on (key, time), sort
    * each key-partition once, carry the last build-side payload forward,
    * keep probe rows. ONE shuffle on `key`, linear in |probe|+|build| —
    * never the O(|probe|·|build|) range-join explosion, which is what makes
    * it hold at 100 TB. Build rows sort BEFORE probe rows at equal time, so
    * the match predicate is `build.time <= probe.time` (inclusive).
    *
    * @param probe    rows asking "state as of my time"
    * @param build    versioned rows supplying the state
    * @param key      equi-join key column name (same name both sides)
    * @param timeCols composite ordinal time, lexicographic (same names both
    *                 sides); pass a unique tiebreaker last for determinism
    * @param payload  build-side columns to carry onto probe rows (must not
    *                 collide with probe column names — rename beforehand)
    */
  def asOfJoin(
      probe: DataFrame,
      build: DataFrame,
      key: String,
      timeCols: Seq[String],
      payload: Seq[String]
  ): DataFrame = {
    val fixed  = key +: timeCols
    val pExtra = probe.columns.toSeq.filterNot(fixed.contains)
    // __side: build=0 sorts before probe=1 at equal time => inclusive <=
    val b = build.select(
      fixed.map(col) ++ Seq(lit(0).as("__side")) ++
        payload.map(c => col(c).as(s"__p_$c")) ++
        pExtra.map(c => lit(null).cast(probe.schema(c).dataType).as(c)): _*
    )
    val p = probe.select(
      fixed.map(col) ++ Seq(lit(1).as("__side")) ++
        payload.map(c => lit(null).cast(build.schema(c).dataType).as(s"__p_$c")) ++
        pExtra.map(col): _*
    )
    val w = Window
      .partitionBy(col(key))
      .orderBy(timeCols.map(col) :+ col("__side"): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    b.unionByName(p)
      .select(
        fixed.map(col) ++ Seq(col("__side")) ++ pExtra.map(col) ++
          payload.map(c => last(col(s"__p_$c"), ignoreNulls = true).over(w).as(c)): _*
      )
      .filter(col("__side") === 1)
      .drop("__side")
  }

  /** Running (cumulative) aggregate per key — the reference's recursive
    * `td = parent_td + difficulty` (`service/indexer/indexer.go:249-274`,
    * A6/W2) as a window cumulative sum.
    */
  def cumSum(df: DataFrame, keys: Seq[String], order: Seq[Column], value: Column, as: String): DataFrame = {
    val w0 = Window.orderBy(order: _*)
    val w  = if (keys.isEmpty) w0 else Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn(as, sum(value).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Carry-forward last non-null value per key (W3 — the reference's
    * "previous total balance, defaulting to zero"
    * `store/transfer_processor.go:337-356`).
    */
  def carryForward(df: DataFrame, keys: Seq[String], order: Seq[Column], value: Column, default: Column, as: String): DataFrame = {
    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn(as, coalesce(last(value, ignoreNulls = true).over(w), default))
  }

  /** Deterministic pagination (O3 — `store/subscription/subscription.go:148-206`).
    * `order` must be a total order for stable pages. Spark plans a global
    * sort + limit pushed into TakeOrderedAndProject when possible.
    */
  def paginate(df: DataFrame, order: Seq[Column], page: Int, pageSize: Int): DataFrame = {
    require(page >= 1 && pageSize >= 1, "invalid page/limit")
    df.orderBy(order: _*).offset((page - 1) * pageSize).limit(pageSize)
  }

  /** Two-phase salted aggregation for skewed keys: partials aggregate on
    * (key, salt) — spreading a hot key over `saltBuckets` reducers — then
    * finals merge per key. Same result as a direct groupBy for any
    * associative aggregate; use when one key dominates (a hot contract
    * address, an empty-string token) and AQE's skew handling can't help
    * because the skew is in the AGGREGATION key, not a join.
    *
    * The salt is a DETERMINISTIC row hash (xxhash64 over every input
    * column): a task retried after a shuffle-fetch failure re-derives the
    * same (key, salt) partials, so no row is double-counted or lost
    * (SPARK-23207 class). spark_partition_id/monotonically_increasing_id
    * would differ across recomputation. Rows identical in every column
    * share a salt — spreading still happens whenever any non-key column
    * varies, which is what makes a key hot in the first place.
    */
  def saltedSum(df: DataFrame, keys: Seq[String], value: Column, as: String,
                saltBuckets: Int = 16): DataFrame = {
    val salted = df.withColumn("__salt", pmod(xxhash64(df.columns.map(col): _*), lit(saltBuckets)))
    salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(sum(value).as("__partial"))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__partial")).as(as))
  }

  /** Gaps-and-islands sessionization: assign each row a per-key session
    * sequence number, where a new session starts when the gap to the
    * previous row's timestamp exceeds `gapSeconds`. The classic two-window
    * formulation — lag to flag session breaks, cumulative sum to number
    * them — costs ONE hash-partition shuffle on `keys` (both windows share
    * the same partitioning/ordering, so Catalyst plans a single sort), no
    * join, no state. This is the batch face; the streaming face is
    * `streaming.StreamingSessions` (Structured Streaming `session_window`),
    * which produces the same session boundaries incrementally.
    *
    * Boundary convention: an event at EXACTLY `gap` after the previous
    * one STAYS in-session (`delta > gap` breaks). This matches Structured
    * Streaming's `session_window`, whose merge test is inclusive — a
    * window starting exactly at an open window's end merges into it
    * (measured empirically, within-batch AND across the state-merge path;
    * round 14's scaladoc claimed the opposite). The batch and streaming
    * faces therefore agree row-for-row even on exact-boundary events,
    * pinned both ways by SessionParitySpec.
    *
    * `order` must be a total order within a key (timestamp + unique
    * tiebreaker) so the session numbering is deterministic.
    */
  def sessionize(df: DataFrame, keys: Seq[String], tsCol: Column,
                 order: Seq[Column], gapSeconds: Long, as: String = "session_seq"): DataFrame = {
    val w    = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    val prev = lag(tsCol, 1).over(w)
    // compare at microsecond precision: a seconds cast TRUNCATES, so a gap
    // within 1s of the threshold would disagree with any micros-exact system
    val gapUs = gapSeconds * 1000000L
    val brk = when(prev.isNull ||
      unix_micros(tsCol.cast("timestamp")) - unix_micros(prev.cast("timestamp")) > gapUs, 1L).otherwise(0L)
    df.withColumn(as, sum(brk).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Disjunctive semi-join: keep `left` rows where ANY of `leftKeys` hits the
    * `right` key set (J2 — events kept when `from` OR `to` is subscribed,
    * `store/transfer_processor.go:164-177`). An OR-condition join defeats
    * hash joins, so each key gets its own equi LEFT OUTER against the
    * deduped key set (broadcast, hash-joinable; no row multiplication since
    * the build side is distinct) and a row survives if any probe matched.
    * Exact multiset semantics — duplicate left rows are preserved, unlike a
    * union+dedup formulation.
    */
  def semiJoinAny(left: DataFrame, right: DataFrame, leftKeys: Seq[String], rightKey: String): DataFrame = {
    val keySet = broadcast(right.select(col(rightKey).as("__match_key")).distinct())
    val flagged = leftKeys.zipWithIndex.foldLeft(left) { case (df, (k, i)) =>
      df.join(keySet, df(k) === col("__match_key"), "left_outer")
        .withColumn(s"__hit_$i", col("__match_key").isNotNull)
        .drop("__match_key")
    }
    flagged
      .filter(leftKeys.indices.map(i => col(s"__hit_$i")).reduce(_ || _))
      .drop(leftKeys.indices.map(i => s"__hit_$i"): _*)
  }

  /** Bucketized interval self-join (j9): all pairs of rows sharing the
    * key whose [start, end] intervals overlap — the range-join Spark has
    * no native operator for, built so it NEVER plans a cartesian or a
    * theta-join: each interval explodes to the fixed-width buckets it
    * covers, candidates meet in an EQUI-join on (keys, bucket), and the
    * exact overlap predicate filters after the hash join. A pair
    * overlapping several shared buckets is emitted exactly once — at the
    * bucket containing max(start_a, start_b) — so no distinct/Expand
    * dedup stage exists (the r8 "write-shape, not a global sort" move
    * applied to pair dedup).
    *
    * Scale: shuffle is (keys, bucket)-hashed; cost is Σ_bucket n_b² per
    * key — inherent to overlap semantics (local density is the real
    * driver), never |corpus|². `maxBucketsPerRow` valves hostile spans:
    * a row covering more buckets than the valve is dropped (counted by
    * the caller via the returned filter), so one year-long interval
    * cannot explode the build side. Bucket width tunes the
    * replication-vs-selectivity trade: ~the typical interval length.
    *
    * Output: keys…, `id_a`, `id_b` (id_a < id_b), `overlap_us` ≥ 0.
    */
  def intervalJoin(df: DataFrame, keyCols: Seq[String], idCol: String,
                   startCol: Column, endCol: Column, bucketMicros: Long,
                   maxBucketsPerRow: Int = 1024): DataFrame = {
    require(bucketMicros > 0, "bucketMicros must be positive")
    // integer DIV throughout: double division of epoch-micros quotients
    // floors correctly only within an ulp margin — not a bet to make
    val bs = bucketMicros.toString
    val base = df.select(keyCols.map(col) :+ col(idCol).as("__id") :+
        startCol.cast("long").as("__s") :+ endCol.cast("long").as("__e"): _*)
      .filter(col("__s") >= 0L && col("__e") >= col("__s"))
      .filter(expr(s"__e DIV $bs - __s DIV $bs") < lit(maxBucketsPerRow.toLong))
    val bucketed = base.withColumn("__b",
      explode(sequence(expr(s"__s DIV $bs"), expr(s"__e DIV $bs"))))
    val left = bucketed.select(keyCols.map(col) :+ col("__b") :+
      col("__id").as("id_a") :+ col("__s").as("__sa") :+ col("__e").as("__ea"): _*)
    val right = bucketed.select(keyCols.map(col) :+ col("__b") :+
      col("__id").as("id_b") :+ col("__s").as("__sb") :+ col("__e").as("__eb"): _*)
    left.join(right, keyCols :+ "__b")
      .filter(col("id_a") < col("id_b"))
      .filter(col("__sa") <= col("__eb") && col("__sb") <= col("__ea"))
      // exactly-once: report at the bucket holding the later start
      .filter(col("__b") === expr(s"greatest(__sa, __sb) DIV $bs"))
      .select(keyCols.map(col) :+ col("id_a") :+ col("id_b") :+
        (least(col("__ea"), col("__eb")) - greatest(col("__sa"), col("__sb")))
          .as("overlap_us"): _*)
  }
}
