package graft.queries

import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.functions._
import graft.operators.Relational
import graft.sources.Tables

/** SURVEY.md §2.4/§2.5/§2.6 aggregations, windows, sorts over testdata. */
object AggQueries {
  private val dec = DecimalType(38, 6)

  val defs: Map[String, QueryDef] = Map(

    // A5 — fee rollup per subscribed sender (store/transfer_processor.go:224-249):
    // semi-join with the watched set first, then join + group. The watched
    // dimension broadcasts; only matching orders reach the big join.
    "a5_fee_rollup" -> QueryDef.sql(
      (s, d) => {
        val t       = Tables(s, d)
        val watched = t.customer.filter(col("c_acctbal") > 9000.0).select("c_custkey")
        val subbed  = t.orders.join(broadcast(watched), col("o_custkey") === col("c_custkey"), "left_semi")
        subbed.join(t.lineitem, col("l_orderkey") === col("o_orderkey"))
          .groupBy("o_custkey")
          .agg(sum((col("l_extendedprice") * col("l_discount")).cast(dec)).cast("double").as("fee"),
            count(lit(1)).as("n_items"))
          .orderBy("o_custkey")
      },
      """SELECT o_custkey,
        |   CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(38,6))) AS DOUBLE) AS fee,
        |   count(*) AS n_items
        | FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        | WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 9000.0)
        | GROUP BY o_custkey ORDER BY o_custkey""".stripMargin
    ),

    // A7 — fork-schedule reward arithmetic (common/utils.go:216-254:
    // Frontier 5 / Byzantium 3 / Constantinople 2) as pure when/otherwise
    // column math on era boundaries — no UDF.
    "a7_reward_schedule" -> QueryDef.sql(
      (s, d) => {
        val era = when(col("o_orderdate") < lit("1997-01-01").cast("timestamp"), 5L)
          .when(col("o_orderdate") < lit("1999-01-01").cast("timestamp"), 3L)
          .otherwise(2L)
        Tables(s, d).orders
          .withColumn("base_reward", era)
          .groupBy("base_reward")
          .agg(count(lit(1)).as("n_orders"),
            sum(col("o_totalprice").cast(dec)).cast("double").as("sum_price"))
          .orderBy("base_reward")
      },
      """SELECT CASE WHEN o_orderdate < TIMESTAMP '1997-01-01' THEN 5
        |             WHEN o_orderdate < TIMESTAMP '1999-01-01' THEN 3
        |             ELSE 2 END AS base_reward,
        |   count(*) AS n_orders,
        |   CAST(sum(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_price
        | FROM orders GROUP BY 1 ORDER BY base_reward""".stripMargin
    ),

    // A8 — per-(group, token) totals rollup (store/transfer_processor.go:322-416)
    "a8_group_token_rollup" -> QueryDef.sql(
      (s, d) => Tables(s, d).events
        .withColumn("grp", col("user_id") % 10L)
        .groupBy("grp", "event_type")
        .agg(sum(col("value").cast(dec)).cast("double").as("total"),
          count(lit(1)).as("n"))
        .orderBy("grp", "event_type"),
      """SELECT user_id % 10 AS grp, event_type,
        |   CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total, count(*) AS n
        | FROM events GROUP BY 1, 2 ORDER BY grp, event_type""".stripMargin
    ),

    // A9 — sentinel-classified reward diffs (store/transfer_processor.go:169-219;
    // predicates model/types.go:215-224): conditional sums per account.
    "a9_conditional_sums" -> QueryDef.sql(
      (s, d) => Tables(s, d).events
        .groupBy("user_id")
        .agg(
          coalesce(sum(when(col("event_type") === "purchase", col("value")).cast(dec)), lit(0).cast(dec)).cast("double").as("purchase_total"),
          coalesce(sum(when(col("event_type") === "error", col("value")).cast(dec)), lit(0).cast(dec)).cast("double").as("error_total"))
        .orderBy("user_id"),
      """SELECT user_id,
        |   CAST(coalesce(sum(CAST(CASE WHEN event_type = 'purchase' THEN value END AS DECIMAL(38,6))), 0) AS DOUBLE) AS purchase_total,
        |   CAST(coalesce(sum(CAST(CASE WHEN event_type = 'error' THEN value END AS DECIMAL(38,6))), 0) AS DOUBLE) AS error_total
        | FROM events GROUP BY user_id ORDER BY user_id""".stripMargin
    ),

    // A10 — seed totals per group (store/new_erc20.go:104-162)
    "a10_seed_totals" -> QueryDef.sql(
      (s, d) => Tables(s, d).embeddings
        .groupBy("label")
        .agg(count(lit(1)).as("n"),
          sum(element_at(col("embedding"), 1).cast("double").cast(dec)).as("sum_first_dim"))
        .orderBy("label"),
      """SELECT label, count(*) AS n,
        |   sum(CAST(CAST(embedding[1] AS DOUBLE) AS DECIMAL(38,6))) AS sum_first_dim
        | FROM embeddings GROUP BY label ORDER BY label""".stripMargin
    ),

    // W3 — carry-forward last non-null per key with default
    // (store/transfer_processor.go:337-356: previous total balance or zero)
    "w3_carry_forward" -> QueryDef.sql(
      (s, d) => Relational.carryForward(
        Tables(s, d).events
          .withColumn("purchase_value", when(col("event_type") === "purchase", col("value"))),
        Seq("user_id"), Seq(col("ts"), col("event_id")),
        col("purchase_value"), lit(0.0), "last_purchase_value")
        .select("user_id", "event_id", "last_purchase_value")
        .orderBy("user_id", "event_id"),
      """SELECT user_id, event_id,
        |   coalesce(last_value(CASE WHEN event_type = 'purchase' THEN value END IGNORE NULLS)
        |     OVER (PARTITION BY user_id ORDER BY ts, event_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0.0) AS last_purchase_value
        | FROM events ORDER BY user_id, event_id""".stripMargin
    ),

    // O2 — full descending sort of one entity's history
    // (store/account/account.go:67,223-234)
    "o2_sorted_history" -> QueryDef.sql(
      (s, d) => Tables(s, d).events
        .filter(col("user_id") === 5L)
        .select("event_id", "ts", "event_type", "value")
        .orderBy(desc("ts"), desc("event_id")),
      """SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, event_type, value
        | FROM events WHERE user_id = 5 ORDER BY ts DESC, event_id DESC""".stripMargin
    ),

    // W4 — gaps-and-islands sessionization (24h inactivity gap) + session
    // rollup: the canonical event-stream prep step (per-user activity
    // bursts for engagement/behavior features). Two windows + one groupBy,
    // all sharing ONE hash-partition shuffle on user_id — Catalyst plans a
    // single sort, no join, no state. The streaming face of the same
    // boundaries is streaming.StreamingSessions (session_window).
    "w4_sessionize" -> QueryDef.sql(
      (s, d) => Relational.sessionize(Tables(s, d).events, Seq("user_id"),
          col("ts"), Seq(col("ts"), col("event_id")), gapSeconds = 86400L)
        .groupBy("user_id", "session_seq")
        .agg(count(lit(1)).as("n_events"),
          min("ts").as("start_ts"), max("ts").as("end_ts"),
          (unix_micros(max(col("ts"))) - unix_micros(min(col("ts")))).as("duration_us"))
        .orderBy("user_id", "session_seq"),
      """WITH g AS (SELECT user_id, ts, event_id,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |         OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 86400000000 THEN 1 ELSE 0 END AS brk
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        | n AS (SELECT user_id, ts,
        |    CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
        |  FROM g)
        | SELECT user_id, session_seq, count(*) AS n_events,
        |   CAST(min(ts) AS TIMESTAMP) AS start_ts, CAST(max(ts) AS TIMESTAMP) AS end_ts,
        |   epoch_us(max(ts)) - epoch_us(min(ts)) AS duration_us
        | FROM n GROUP BY user_id, session_seq ORDER BY user_id, session_seq""".stripMargin
    ),

    // A11 — recency-weighted rollup: each event weighs by an INTEGER
    // recency ramp (30-day linear decay anchored at the corpus max date),
    // so the arithmetic is decimal-exact end to end — no transcendental
    // decay factor whose last ULP differs across engines. The anchor is a
    // one-row broadcast (scalar subquery shape); the rollup itself is one
    // combine-friendly aggregation.
    "a11_decayed_sum" -> QueryDef.sql(
      (s, d) => {
        val ev     = Tables(s, d).events
        val anchor = ev.agg(max(to_date(col("ts"))).as("__anchor"))
        ev.crossJoin(broadcast(anchor))
          .withColumn("__w",
            greatest(lit(0), lit(30) - datediff(col("__anchor"), to_date(col("ts")))))
          .groupBy("user_id")
          .agg(sum((col("value").cast(dec) * col("__w")).cast(dec)).cast("double").as("decayed_total"),
            count(lit(1)).as("n"))
          .orderBy("user_id")
      },
      """WITH mx AS (SELECT CAST(max(ts) AS DATE) AS anchor FROM events)
        | SELECT user_id,
        |   CAST(sum(CAST(CAST(value AS DECIMAL(38,6))
        |     * greatest(0, 30 - date_diff('day', CAST(ts AS DATE), anchor)) AS DECIMAL(38,6))) AS DOUBLE) AS decayed_total,
        |   count(*) AS n
        | FROM events, mx GROUP BY user_id ORDER BY user_id""".stripMargin
    ),

    // A12 — session funnel: within each w4 session, did the user progress
    // view → click (after the first view) → purchase (after that click)?
    // The event-analytics staple over sessionized streams. Three chained
    // min-CASE windows plus the session rollup, ALL on the same (user)
    // partition key — Catalyst plans one hash shuffle for the lot;
    // timestamps compare at exact micros.
    "a12_session_funnel" -> QueryDef.sql(
      (s, d) => {
        val sess = Relational.sessionize(Tables(s, d).events, Seq("user_id"),
          col("ts"), Seq(col("ts"), col("event_id")), gapSeconds = 86400L)
        val w  = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id", "session_seq")
        val us = unix_micros(col("ts"))
        val v  = min(when(col("event_type") === "view", us)).over(w)
        val sv = sess.withColumn("__v", v)
        val c  = min(when(col("event_type") === "click" && us > col("__v"), us)).over(w)
        val sc = sv.withColumn("__c", c)
        val p  = min(when(col("event_type") === "purchase" && us > col("__c"), us)).over(w)
        sc.withColumn("__p", p)
          .withColumn("__reached",
            when(col("__p").isNotNull, 3).when(col("__c").isNotNull, 2)
              .when(col("__v").isNotNull, 1).otherwise(0).cast("int"))
          .groupBy("user_id", "session_seq")
          .agg(count(lit(1)).as("n_events"), max(col("__reached")).as("reached"))
          .orderBy("user_id", "session_seq")
      },
      """WITH g AS (SELECT user_id, ts, event_id, event_type,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |         OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 86400000000 THEN 1 ELSE 0 END AS brk
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        | n AS (SELECT user_id, ts, event_type,
        |    CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
        |  FROM g),
        | v AS (SELECT *, min(CASE WHEN event_type = 'view' THEN epoch_us(ts) END)
        |    OVER (PARTITION BY user_id, session_seq) AS fv FROM n),
        | c AS (SELECT *, min(CASE WHEN event_type = 'click' AND epoch_us(ts) > fv
        |    THEN epoch_us(ts) END) OVER (PARTITION BY user_id, session_seq) AS fc FROM v),
        | p AS (SELECT *, min(CASE WHEN event_type = 'purchase' AND epoch_us(ts) > fc
        |    THEN epoch_us(ts) END) OVER (PARTITION BY user_id, session_seq) AS fp FROM c)
        | SELECT user_id, session_seq, count(*) AS n_events,
        |   CAST(max(CASE WHEN fp IS NOT NULL THEN 3 WHEN fc IS NOT NULL THEN 2
        |     WHEN fv IS NOT NULL THEN 1 ELSE 0 END) AS INTEGER) AS reached
        | FROM p GROUP BY user_id, session_seq ORDER BY user_id, session_seq""".stripMargin
    ),

    // A13 — weekly cohort retention: the classic activation telemetry
    // (users whose FIRST event fell in week c, still active in week c+k).
    // Shape: first-week is one user-keyed min (map-side combine), activity
    // is a distinct (user, week) aggregation, and the rollup counts rows —
    // never countDistinct's Expand; cohort sizes are a tiny relation the
    // planner broadcasts. Monday-start date_trunc('week') on both engines.
    "a13_cohort_retention" -> QueryDef.sql(
      (s, d) => {
        val ev = Tables(s, d).events
        val firstWeek = ev.groupBy("user_id")
          .agg(date_trunc("week", min(col("ts"))).cast("date").as("cohort"))
        val sizes = firstWeek.groupBy("cohort").agg(count(lit(1)).as("cohort_users"))
        val active = ev.select(col("user_id"),
          date_trunc("week", col("ts")).cast("date").as("week")).distinct()
        active.join(firstWeek, "user_id")
          .withColumn("week_offset",
            (datediff(col("week"), col("cohort")) / 7).cast("int"))
          .groupBy("cohort", "week_offset").agg(count(lit(1)).as("n_active"))
          .join(sizes, "cohort")
          .select(col("cohort"), col("week_offset"), col("n_active"),
            round(col("n_active").cast("double") / col("cohort_users").cast("double"), 6)
              .as("retention"))
          .orderBy("cohort", "week_offset")
      },
      """WITH fw AS (SELECT user_id,
        |    CAST(date_trunc('week', min(CAST(ts AS TIMESTAMP))) AS DATE) AS cohort
        |  FROM events GROUP BY user_id),
        | sz AS (SELECT cohort, count(*) AS cohort_users FROM fw GROUP BY 1),
        | aw AS (SELECT DISTINCT user_id,
        |    CAST(date_trunc('week', CAST(ts AS TIMESTAMP)) AS DATE) AS week FROM events),
        | act AS (SELECT f.cohort,
        |    CAST(date_diff('day', f.cohort, a.week) // 7 AS INT) AS week_offset,
        |    CAST(count(*) AS BIGINT) AS n_active
        |  FROM aw a JOIN fw f USING (user_id) GROUP BY 1, 2)
        | SELECT act.cohort, act.week_offset, act.n_active,
        |   round(CAST(n_active AS DOUBLE) / CAST(cohort_users AS DOUBLE), 6) AS retention
        | FROM act JOIN sz USING (cohort) ORDER BY cohort, week_offset""".stripMargin
    ),

    // W1 variant — top-n per key (rank ≤ 3 latest events per user)
    "w1_topn_per_key" -> QueryDef.sql(
      (s, d) => Relational.topNPerKey(
        Tables(s, d).events, Seq("user_id"), Seq(col("ts"), col("event_id")), 3)
        .select("user_id", "rank_in_key", "event_id", "event_type")
        .orderBy("user_id", "rank_in_key"),
      """SELECT user_id, rn AS rank_in_key, event_id, event_type FROM (
        |   SELECT user_id, event_id, event_type,
        |          row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |   FROM events) WHERE rn <= 3 ORDER BY user_id, rank_in_key""".stripMargin
    )
  )
}
