package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Window-function operators (SURVEY.md §2.5).
  *
  * Determinism (SURVEY §5.4): every window orderBy carries a unique
  * tiebreak; outputs are bounded fingerprint aggregates over the
  * windowed rows (never full-table dumps); doubles rounded to 4.
  *
  * Scale notes (100 TB): a window = ONE shuffle on its partition key +
  * a per-partition sort — no global sort anywhere here. Top-k-per-group
  * via row_number keeps only k rows per key after the rank filter, so
  * downstream state is bounded. The running/range frames operate on a
  * pre-aggregated (status, day) table — thousands of rows per
  * partition regardless of fact-table size, so the frame scan cost is
  * independent of SF.
  */
object Windows {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // FIFO budget waterfall (r12) — the sequential-allocation shape
    // finance calls "cash application" (payments applied to invoices
    // in date order until exhausted): each customer's budget = half
    // their lifetime spend in integer cents, orders funded in
    // (o_orderdate, o_orderkey) order, allocation = clamp(budget −
    // cum_prev, 0, price). ONE exclusive-frame window cumsum per
    // customer — the declarative form of a loop every imperative
    // billing system writes; integer cents end-to-end (the cuped
    // discipline: budget = total div 2 is exact, clamps are integer
    // min/max), so the full/partial/unfunded split is bit-stable.
    // Output: per-priority census of funding outcomes + exact
    // allocated totals. Scale: customer-partitioned window, the
    // embarrassingly-parallel grain.
    "window_budget_waterfall" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey")
      val wOrd = w.orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, -1)
      Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
          col("o_orderpriority").as("pri"),
          (col("o_totalprice").cast("decimal(18,2)") * 100)
            .cast("long").as("pc"))
        .withColumn("budget", expr("sum(pc) OVER " +
          "(PARTITION BY o_custkey) div 2"))
        .withColumn("cum_prev",
          coalesce(sum(col("pc")).over(wOrd), lit(0L)))
        .withColumn("alloc",
          greatest(lit(0L), least(col("pc"),
            col("budget") - col("cum_prev"))))
        .groupBy("pri")
        .agg(count(lit(1)).as("n_orders"),
          count(when(col("alloc") === col("pc"), 1)).as("n_full"),
          count(when(col("alloc") > 0 && col("alloc") < col("pc"), 1))
            .as("n_partial"),
          count(when(col("alloc") === 0, 1)).as("n_unfunded"),
          round((sum(col("alloc")).cast("decimal(28,0)").cast("double")
            / 100.0), 4).as("allocated_total"))
        .orderBy("pri")
    }),
    // Value window functions with IGNORE NULLS over a whole-partition
    // frame: first/last/second non-null value per user's event
    // sequence (nulls derived deterministically: value < 50 → null).
    // All three share one window spec → a single Window operator; the
    // per-partition constants collapse via distinct. Raw values pass
    // through untouched — bit-exact parity, no rounding needed.
    "window_value_functions" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy("us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.events(s, d)
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("us"),
          when(col("value") < 50, lit(null)).otherwise(col("value")).as("v"))
        .select(col("user_id"),
          first(col("v"), ignoreNulls = true).over(w).as("first_v"),
          last(col("v"), ignoreNulls = true).over(w).as("last_v"),
          nth_value(col("v"), 2, ignoreNulls = true).over(w).as("second_v"))
        .distinct()
        .orderBy("user_id")
    }),
    // Top-3 orders per customer by price (row_number/rank/dense_rank),
    // fingerprinted by rank position so the output is 3 rows at any SF.
    "window_rank_topk_per_group" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.orders(s, d)
        .withColumn("rn", row_number().over(w))
        .withColumn("rk", rank().over(w))
        .withColumn("drk", dense_rank().over(w))
        .filter(col("rn") <= 3)
        .groupBy("rn")
        .agg(
          count(lit(1)).as("n_orders"),
          // decimal-exact sum: order-independent at any SF (§5.4.2)
          round(sum(col("o_totalprice").cast("decimal(18,2)")).cast("double"), 4)
            .as("sum_price"),
          sum(col("rk")).as("sum_rank"),
          sum(col("drk")).as("sum_dense_rank"))
        .orderBy("rn")
    }),

    // Per-user sessionization: lag(ts) gap > 30 min starts a new
    // session; session id = running sum of the new-session flag.
    // Output: histogram of session sizes (bounded).
    "window_lag_lead_sessionize" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      Tables.events(s, d)
        .withColumn("prev_ts", lag(col("ts"), 1).over(w))
        .withColumn("new_sess",
          when(col("prev_ts").isNull ||
            col("ts") > col("prev_ts") + expr("INTERVAL 30 MINUTES"), 1)
            .otherwise(0))
        .withColumn("sess_id", sum(col("new_sess")).over(w))
        .groupBy("user_id", "sess_id")
        .agg(count(lit(1)).as("sess_len"))
        .groupBy("sess_len")
        .agg(count(lit(1)).as("n_sessions"))
        .orderBy("sess_len")
    }),

    // Running total (rows frame) + 7-day moving average (range frame)
    // over the per-(status, day) daily revenue series.
    // Exact interpolated percentile as a WINDOW analytic (whole
    // partition frame): every row carries its group's median/p90 —
    // the per-row enrichment shape (no join back after a groupBy
    // percentile). Parity: Spark `percentile` ≡ DuckDB `quantile_cont`
    // windowed, both linear-interpolated (established by
    // agg_percentile).
    "window_percentile_frame" -> ((s, d) =>
      Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"),
          round(expr("percentile(o_totalprice, 0.5) OVER " +
            "(PARTITION BY o_orderstatus)"), 4).as("grp_median"),
          round(expr("percentile(o_totalprice, 0.9) OVER " +
            "(PARTITION BY o_orderstatus)"), 4).as("grp_p90"))
        .filter(col("o_orderkey") % 571 === 0)
        .select(col("o_orderkey"), col("o_orderstatus"),
          round(col("o_totalprice"), 4).as("price"),
          col("grp_median"), col("grp_p90"))
        .orderBy("o_orderkey")),

    "window_running_frame" -> ((s, d) => {
      val daily = Tables.orders(s, d)
        .groupBy(col("o_orderstatus").as("st"),
          datediff(to_date(col("o_orderdate")), lit("1992-01-01")).as("day"))
        .agg(round(sum(col("o_totalprice").cast("decimal(18,2)")).cast("double"), 4)
          .as("daily_total"))
      val wRun = Window.partitionBy("st").orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wMav = Window.partitionBy("st").orderBy("day")
        .rangeBetween(-6, 0)
      daily
        // the running sum accumulates to 1e9+: decimal window sum is
        // exact under any frame-evaluation association (§5.4.2)
        .withColumn("running_total",
          round(sum(col("daily_total").cast("decimal(18,4)")).over(wRun)
            .cast("double"), 4))
        .withColumn("mavg_7d", round(avg(col("daily_total")).over(wMav), 4))
        .filter(col("day") % 50 === 0)
        .select("st", "day", "daily_total", "running_total", "mavg_7d")
        .orderBy("st", "day")
    }),

    // ntile(4) quartiles + first/last value over an explicit full frame.
    "window_ntile_analytic" -> ((s, d) => {
      val w = Window.partitionBy("c_mktsegment")
        .orderBy(col("c_acctbal"), col("c_custkey"))
      val wFull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.customer(s, d)
        .withColumn("quartile", ntile(4).over(w))
        .withColumn("seg_min_bal", first(col("c_acctbal")).over(wFull))
        .withColumn("seg_max_bal", last(col("c_acctbal")).over(wFull))
        .groupBy("c_mktsegment", "quartile")
        .agg(
          count(lit(1)).as("n"),
          round(avg(col("c_acctbal")), 4).as("avg_bal"),
          round(min(col("seg_min_bal")), 4).as("seg_min"),
          round(max(col("seg_max_bal")), 4).as("seg_max"))
        .orderBy("c_mktsegment", "quartile")
    }),

    "window_range_interval" -> rangeInterval,

    // Batch session_window (r13) — the BATCH twin of
    // stream_session_window, a genuinely distinct code path: Spark
    // plans a dedicated MergingSessions operator (partial per-session
    // counts → ONE user_id exchange → sort → in-partition session
    // merge) instead of a generic window walk, so sessionization costs
    // exactly one shuffle with map-side partials at 100 TB — strictly
    // better than the lag/cumsum rewrite, whose running-sum window
    // cannot take partial aggregation. The oracle IS that classic
    // gaps-islands rewrite in DuckDB (lag → gap flag → cumulative
    // session id → per-session agg) — the hash match proves the
    // native operator computes the textbook semantics: session start
    // = first event, end = last event + gap. Micros are compared as
    // BIGINT (the §5.4.3 ns/µs discipline); Round13Spec pins the
    // MergingSessions node and the single exchange.
    "window_session_batch" -> ((s, d) =>
      Tables.events(s, d)
        .filter(col("user_id") % 5 === 0)
        .groupBy(col("user_id"),
          session_window(col("ts"), "30 minutes").as("sw"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"),
          unix_micros(col("sw.start")).as("s_us"),
          unix_micros(col("sw.end")).as("e_us"),
          col("n_events"))
        .orderBy("user_id", "s_us")),

    // DYNAMIC-gap session window (r13) — session_window(ts, gapCol)
    // with a per-EVENT gap expression: purchases close their session
    // after 10 min of silence, everything else after 45 — the
    // per-event-type session policy real clickstream warehouses run,
    // and a genuinely distinct code path from the static form (the
    // gap is evaluated per row inside the session assignment). Same
    // MergingSessions one-shuffle plan. Oracle: the gaps-islands
    // rewrite generalized to a RUNNING MAX of per-event window ends
    // (max(us + gap) over preceding rows) — an event starts a new
    // session iff its start ≥ that running end (half-open windows),
    // and a merged session's end is the MAX member end, not the last
    // event's. Tie-safe: equal-timestamp events always co-session
    // (any positive gap overlaps), and both branches of the running
    // max are order-free within a tie group.
    "window_session_dynamic_gap" -> ((s, d) =>
      Tables.events(s, d)
        .filter(col("user_id") % 7 === 0)
        .withColumn("gap",
          when(col("event_type") === "purchase", "10 minutes")
            .otherwise("45 minutes"))
        .groupBy(col("user_id"),
          session_window(col("ts"), col("gap")).as("sw"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"),
          unix_micros(col("sw.start")).as("s_us"),
          unix_micros(col("sw.end")).as("e_us"),
          col("n_events"))
        .orderBy("user_id", "s_us")),
  )

  /** Time-interval RANGE frame: events per user in the trailing hour.
    * Both engines order by epoch-microseconds (BIGINT) with an
    * integer range — interval frames over raw timestamps would hit
    * the ns-vs-µs precision landmine (§5.4.3); the integer form is
    * precision-exact on both sides. */
  private def rangeInterval: Q = (s, d) =>
    Tables.events(s, d)
      .filter(col("user_id") % 25 === 0)
      .withColumn("tus", unix_micros(col("ts")))
      .withColumn("n_1h", count(lit(1)).over(
        Window.partitionBy("user_id").orderBy("tus")
          .rangeBetween(-3600000000L, 0)))
      .select("user_id", "event_id", "n_1h")
      .orderBy("user_id", "event_id")

  val oracles: Map[String, String] = Map(
    // the classic gaps-islands rewrite of session_window: a 30-min
    // silence closes the session; end = last event + 30 min
    "window_session_batch" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS us
                    FROM events WHERE user_id % 5 = 0),
              g AS (SELECT user_id, us,
                           CASE WHEN us - lag(us) OVER
                                  (PARTITION BY user_id ORDER BY us)
                                >= 1800000000 OR lag(us) OVER
                                  (PARTITION BY user_id ORDER BY us)
                                  IS NULL
                                THEN 1 ELSE 0 END AS brk
                    FROM e),
              sid AS (SELECT user_id, us,
                             sum(brk) OVER (PARTITION BY user_id
                               ORDER BY us ROWS UNBOUNDED PRECEDING)
                               AS sess
                      FROM g)
         SELECT user_id, CAST(min(us) AS BIGINT) AS s_us,
                CAST(max(us) + 1800000000 AS BIGINT) AS e_us,
                CAST(count(*) AS BIGINT) AS n_events
         FROM sid GROUP BY user_id, sess ORDER BY user_id, s_us""",
    // dynamic-gap gaps-islands: running max of per-event window ends;
    // break when the next start clears it (half-open)
    "window_session_dynamic_gap" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS us,
                           CASE WHEN event_type = 'purchase'
                                THEN 600000000 ELSE 2700000000 END AS gap
                    FROM events WHERE user_id % 7 = 0),
              g AS (SELECT user_id, us, gap,
                           max(us + gap) OVER (PARTITION BY user_id
                             ORDER BY us ROWS BETWEEN UNBOUNDED PRECEDING
                             AND 1 PRECEDING) AS prev_end
                    FROM e),
              s AS (SELECT user_id, us, gap,
                           CASE WHEN prev_end IS NULL OR us >= prev_end
                                THEN 1 ELSE 0 END AS brk
                    FROM g),
              sid AS (SELECT user_id, us, gap,
                             sum(brk) OVER (PARTITION BY user_id
                               ORDER BY us ROWS UNBOUNDED PRECEDING)
                               AS sess
                      FROM s)
         SELECT user_id, CAST(min(us) AS BIGINT) AS s_us,
                CAST(max(us + gap) AS BIGINT) AS e_us,
                CAST(count(*) AS BIGINT) AS n_events
         FROM sid GROUP BY user_id, sess ORDER BY user_id, s_us""",
    "window_budget_waterfall" ->
      """WITH o AS (SELECT o_custkey, o_orderkey, o_orderdate,
                           o_orderpriority AS pri,
                           CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                                AS BIGINT) AS pc
                    FROM orders),
              wf AS (SELECT pri, pc,
                            CAST(sum(pc) OVER (PARTITION BY o_custkey)
                                 AS BIGINT) // 2 AS budget,
                            CAST(coalesce(sum(pc) OVER (
                                   PARTITION BY o_custkey
                                   ORDER BY o_orderdate, o_orderkey
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND 1 PRECEDING), 0) AS BIGINT)
                              AS cum_prev
                     FROM o),
              a AS (SELECT pri, pc,
                           greatest(CAST(0 AS BIGINT),
                             least(pc, budget - cum_prev)) AS alloc
                    FROM wf)
         SELECT pri, count(*) AS n_orders,
                count(CASE WHEN alloc = pc THEN 1 END) AS n_full,
                count(CASE WHEN alloc > 0 AND alloc < pc THEN 1 END)
                  AS n_partial,
                count(CASE WHEN alloc = 0 THEN 1 END) AS n_unfunded,
                round(CAST(sum(alloc) AS DOUBLE) / 100.0, 4)
                  AS allocated_total
         FROM a GROUP BY pri ORDER BY pri""",
    "window_value_functions" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us,
                           CASE WHEN value < 50 THEN NULL ELSE value END AS v
                    FROM events)
         SELECT DISTINCT user_id,
                first_value(v IGNORE NULLS) OVER w AS first_v,
                last_value(v IGNORE NULLS) OVER w AS last_v,
                nth_value(v, 2 IGNORE NULLS) OVER w AS second_v
         FROM e
         WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING
                      AND UNBOUNDED FOLLOWING)
         ORDER BY user_id""",
    "window_percentile_frame" ->
      """WITH w AS (SELECT o_orderkey, o_orderstatus, o_totalprice,
                           round(quantile_cont(o_totalprice, 0.5)
                             OVER (PARTITION BY o_orderstatus), 4) AS grp_median,
                           round(quantile_cont(o_totalprice, 0.9)
                             OVER (PARTITION BY o_orderstatus), 4) AS grp_p90
                    FROM orders)
         SELECT o_orderkey, o_orderstatus,
                round(o_totalprice, 4) AS price, grp_median, grp_p90
         FROM w WHERE o_orderkey % 571 = 0 ORDER BY o_orderkey""",
    "window_range_interval" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS tus
                    FROM events WHERE user_id % 25 = 0)
         SELECT user_id, event_id,
                CAST(count(*) OVER (PARTITION BY user_id ORDER BY tus
                     RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
                     AS BIGINT) AS n_1h
         FROM e ORDER BY user_id, event_id""",
    "window_rank_topk_per_group" ->
      """SELECT rn, count(*) AS n_orders,
                round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 4)
                  AS sum_price,
                CAST(sum(rk) AS BIGINT) AS sum_rank,
                CAST(sum(drk) AS BIGINT) AS sum_dense_rank
         FROM (SELECT o_totalprice,
                      row_number() OVER w AS rn,
                      rank() OVER w AS rk,
                      dense_rank() OVER w AS drk
               FROM orders
               WINDOW w AS (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey))
         WHERE rn <= 3 GROUP BY rn ORDER BY rn""",
    "window_lag_lead_sessionize" ->
      """WITH flagged AS (
           SELECT user_id, event_id, ts,
                  CASE WHEN lag(ts) OVER w IS NULL
                         OR ts > lag(ts) OVER w + INTERVAL 30 MINUTE
                       THEN 1 ELSE 0 END AS new_sess
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         sess AS (
           SELECT user_id,
                  sum(new_sess) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS sess_id
           FROM flagged),
         sizes AS (
           SELECT user_id, sess_id, count(*) AS sess_len
           FROM sess GROUP BY user_id, sess_id)
         SELECT sess_len, count(*) AS n_sessions
         FROM sizes GROUP BY sess_len ORDER BY sess_len""",
    "window_running_frame" ->
      """WITH daily AS (
           SELECT o_orderstatus AS st,
                  date_diff('day', DATE '1992-01-01',
                            CAST(o_orderdate AS DATE)) AS day,
                  round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 4)
                    AS daily_total
           FROM orders GROUP BY 1, 2)
         SELECT st, day, daily_total,
                round(CAST(sum(CAST(daily_total AS DECIMAL(18,4)))
                      OVER (PARTITION BY st ORDER BY day
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE), 4)
                  AS running_total,
                round(avg(daily_total) OVER (PARTITION BY st ORDER BY day
                      RANGE BETWEEN 6 PRECEDING AND CURRENT ROW), 4)
                  AS mavg_7d
         FROM daily QUALIFY day % 50 = 0 ORDER BY st, day""",
    "window_ntile_analytic" ->
      """WITH q AS (
           SELECT c_mktsegment, c_acctbal,
                  ntile(4) OVER w AS quartile,
                  first_value(c_acctbal) OVER (PARTITION BY c_mktsegment
                    ORDER BY c_acctbal, c_custkey
                    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
                    AS seg_min_bal,
                  last_value(c_acctbal) OVER (PARTITION BY c_mktsegment
                    ORDER BY c_acctbal, c_custkey
                    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
                    AS seg_max_bal
           FROM customer
           WINDOW w AS (PARTITION BY c_mktsegment
                        ORDER BY c_acctbal, c_custkey))
         SELECT c_mktsegment, quartile, count(*) AS n,
                round(avg(c_acctbal), 4) AS avg_bal,
                round(min(seg_min_bal), 4) AS seg_min,
                round(max(seg_max_bal), 4) AS seg_max
         FROM q GROUP BY c_mktsegment, quartile
         ORDER BY c_mktsegment, quartile""",
  )
}
