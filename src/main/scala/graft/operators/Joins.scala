package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Join operators (SURVEY.md §2.3) — every equi/theta/interval/as-of
  * join variant the engine supports, each as a declared oracle-checked
  * query.
  *
  * Determinism (SURVEY §5.4): bounded outputs (fingerprint aggregates
  * over the join result, never full-table dumps), total ORDER BY,
  * round(x,4) on double aggregates, BIGINT casts in oracles where
  * DuckDB would widen to HUGEINT.
  *
  * Scale notes (100 TB):
  *   - fact⋈fact joins shuffle on the join key once (`hint("merge")`
  *     pins sort-merge so the plan is stable; AQE can still coalesce
  *     partitions / split skew at runtime);
  *   - dimension joins broadcast ONLY constant-cardinality dims
  *     (nation=25, region=5); supplier/customer scale with SF and are
  *     left to the planner/AQE;
  *   - the interval self-join is equi-keyed on user_id so the
  *     quadratic blowup is bounded per user; at extreme per-user
  *     volume add a coarse time-bucket to the equi key;
  *   - the theta/range join broadcasts the tiny band table →
  *     BroadcastNestedLoopJoin touches each fact row once.
  */
object Joins {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // Large-side join: lineitem ⋈ orders on orderkey. `hint("merge")`
    // forces sort-merge (the 100 TB-realistic plan) even though orders
    // fits under the local broadcast threshold at test SF.
    "join_shuffle_large" -> ((s, d) =>
      Tables.lineitem(s, d)
        .join(Tables.orders(s, d).hint("merge"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus")
        .agg(
          count(lit(1)).as("n_items"),
          // decimal-exact sum: order-independent at any SF (§5.4.2)
          round(sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double"), 4)
            .as("revenue"))
        .orderBy("o_orderstatus")),

    // Full star: lineitem → orders → customer, lineitem → supplier →
    // nation → region; only the constant-size dims are broadcast.
    "join_multiway_star" -> ((s, d) =>
      Tables.lineitem(s, d)
        .join(Tables.orders(s, d).hint("merge"),
          col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(Tables.nation(s, d)),
          col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d)),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name", "c_mktsegment")
        .agg(
          count(lit(1)).as("n_items"),
          round(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .cast("decimal(18,4)")).cast("double"), 4).as("revenue"))
        .orderBy("r_name", "c_mktsegment")),

    // Outer joins with REAL non-matches on both sides at every SF
    // (filters guarantee unmatched rows even where doc_id↔vec_id is
    // 1:1). One summary row per join type.
    "join_left_right_full" -> ((s, d) => {
      def dd = Tables.documents(s, d)
        .select(col("doc_id"), col("n_chars")).filter(col("doc_id") % 3 =!= 0)
      def ee = Tables.embeddings(s, d)
        .select(col("vec_id"), col("label")).filter(col("label") < 7)
      def side(kind: String, how: String): DataFrame =
        dd.join(ee, col("doc_id") === col("vec_id"), how)
          .agg(
            count(lit(1)).as("n_rows"),
            count(col("doc_id")).as("n_left"),
            count(col("vec_id")).as("n_right"))
          .select(lit(kind).as("kind"), col("n_rows"), col("n_left"), col("n_right"))
      side("1_left", "left")
        .unionByName(side("2_right", "right"))
        .unionByName(side("3_full", "full"))
        .orderBy("kind")
    }),

    // Customers with at least one order (left-semi → no row duplication).
    "join_semi" -> ((s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left_semi")
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_customers"))
        .orderBy("c_mktsegment")),

    // Customers with NO 'F'-status order (left-anti).
    "join_anti" -> ((s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d).filter(col("o_orderstatus") === "F"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_customers"))
        .orderBy("c_mktsegment")),

    // Cross join of two tiny sets (5 regions × 3 statuses = 15 rows).
    "join_cross" -> ((s, d) =>
      Tables.region(s, d).select("r_name")
        .crossJoin(Tables.orders(s, d).select("o_orderstatus").distinct())
        .orderBy("r_name", "o_orderstatus")),

    // Null-safe equality join (<=>): null keys MATCH each other
    // instead of vanishing — the semantics MERGE/dedup pipelines need
    // when the business key is nullable. Nulls are derived
    // deterministically (nationkey 13 → null on both sides). Catalyst
    // plans <=> as a hash join (null-safe keys hash like values), so
    // the shape is identical to a plain equi-join.
    "join_null_safe" -> ((s, d) => {
      val cust = Tables.customer(s, d)
        .select(nullif(col("c_nationkey"), lit(13)).as("ck"))
      val supp = Tables.supplier(s, d)
        .select(nullif(col("s_nationkey"), lit(13)).as("sk"))
      cust.join(supp, col("ck") <=> col("sk"))
        .groupBy("ck")
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy(col("ck").asc_nulls_first)
    }),

    // Pure non-equi (theta) join: parts against overlapping price
    // bands derived from region keys → BroadcastNestedLoopJoin with
    // the 5-row band table broadcast.
    "join_theta_range" -> ((s, d) => {
      val bands = Tables.region(s, d).select(
        col("r_regionkey").as("band_id"),
        (col("r_regionkey") * lit(20.0) + lit(900.0)).as("lo"),
        (col("r_regionkey") * lit(20.0) + lit(930.0)).as("hi"))
      Tables.part(s, d)
        .join(broadcast(bands),
          col("p_retailprice") >= col("lo") && col("p_retailprice") < col("hi"))
        .groupBy("band_id")
        .agg(
          count(lit(1)).as("n_parts"),
          round(avg(col("p_retailprice")), 4).as("avg_price"))
        .orderBy("band_id")
    }),

    // Interval self-join: pairs of events of the same user within 5
    // minutes. Equi on user_id bounds the pair blowup per user.
    "join_interval_events" -> ((s, d) => {
      val e = Tables.events(s, d)
      val a = e.select(col("user_id"), col("event_id").as("a_id"),
        col("ts").as("a_ts"), col("event_type").as("a_type"))
      val b = e.select(col("user_id").as("b_user"), col("event_id").as("b_id"),
        col("ts").as("b_ts"))
      a.join(b,
          col("user_id") === col("b_user") &&
          col("b_ts") > col("a_ts") &&
          col("b_ts") <= col("a_ts") + expr("INTERVAL 5 MINUTES"))
        .groupBy("a_type")
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy("a_type")
    }),

    // As-of checked against DuckDB's NATIVE ASOF JOIN (the companion
    // to join_asof_last_event, whose oracle mirrors the window
    // formulation): per purchase, the latest prior click; aggregate
    // fingerprint (match count + exact µs-gap sum) is
    // tie-insensitive, so the groupBy-max rewrite here must equal the
    // engine-native asof semantics exactly — cross-formulation
    // evidence that the Spark rewrite IS an asof join.
    "join_asof_native" -> ((s, d) => {
      val e = Tables.events(s, d)
        .withColumn("us", unix_micros(col("ts")))
      val p = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("p_id"), col("us").as("p_us"))
      val c = e.filter(col("event_type") === "click")
        .select(col("user_id").as("c_user"), col("us").as("c_us"))
      p.join(c, col("user_id") === col("c_user") && col("c_us") <= col("p_us"))
        .groupBy("p_id", "p_us")
        .agg(max(col("c_us")).as("m_us"))
        .agg(count(lit(1)).as("n_matched"),
          sum(col("p_us") - col("m_us")).as("sum_gap_us"))
    }),

    // FORWARD as-of (r7, merge_asof direction='forward'): each
    // purchase matched to the user's EARLIEST SUBSEQUENT click — the
    // post-conversion follow-up question (did they come back?),
    // mirror-image of the backward key: same join + groupBy shape
    // with min over c_us >= p_us. Fingerprint counts matches and
    // exact forward gaps.
    "join_asof_forward" -> ((s, d) => {
      val e = Tables.events(s, d).withColumn("us", unix_micros(col("ts")))
      val p = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("p_id"),
          col("us").as("p_us"))
      val c = e.filter(col("event_type") === "click")
        .select(col("user_id").as("c_user"), col("us").as("c_us"))
      p.join(c, col("user_id") === col("c_user")
          && col("c_us") >= col("p_us"), "left")
        .groupBy("p_id", "p_us")
        .agg(min(col("c_us")).as("m_us"))
        .agg(count(lit(1)).as("n_purchases"),
          count(col("m_us")).as("n_followed"),
          coalesce(sum(col("m_us") - col("p_us")), lit(0L)).cast("bigint")
            .as("gap_us_total"))
    }),

    // As-of with TOLERANCE (r7, the pandas merge_asof `tolerance`
    // semantics): the latest prior click still matches only if it is
    // within 10 minutes — staler matches are rejected as if absent.
    // Same groupBy-max shape as join_asof_last_event (the tolerance
    // is a post-max filter, NOT a different join), so the plan cost
    // is identical; the declared fingerprint splits matches into
    // within / beyond tolerance so both sides of the cut are
    // hash-checked.
    "join_asof_tolerance" -> ((s, d) => {
      val tolUs = 10L * 60 * 1000000
      val e = Tables.events(s, d).withColumn("us", unix_micros(col("ts")))
      val p = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("p_id"),
          col("us").as("p_us"))
      val c = e.filter(col("event_type") === "click")
        .select(col("user_id").as("c_user"), col("us").as("c_us"))
      p.join(c, col("user_id") === col("c_user")
          && col("c_us") <= col("p_us"), "left")
        .groupBy("p_id", "p_us")
        .agg(max(col("c_us")).as("m_us"))
        .agg(count(lit(1)).as("n_purchases"),
          count(col("m_us")).as("n_matched_any"),
          count(when(col("p_us") - col("m_us") <= tolUs, 1))
            .as("n_within_tol"),
          coalesce(sum(when(col("p_us") - col("m_us") <= tolUs,
            col("p_us") - col("m_us"))), lit(0L)).cast("bigint")
            .as("gap_us_within"))
    }),

    // Bucketed tolerance as-of (r12) — the SCALE PATH for the key
    // above, the join_interval_bucketed idea applied to as-of: a
    // tolerance-bounded as-of never needs the unbounded per-user
    // range scan (which is Θ(clicks-per-user) per purchase however
    // it's planned) — cell = ⌊us/tol⌋ makes every admissible click
    // live in the purchase's cell or the one before, so the probe
    // side replicates ×2 (a constant) and the join is PURE EQUI on
    // (user, cell): hash-partitionable, skew-saltable, AQE-splittable
    // — the join a 100 TB event store can actually run. Exact
    // refine (c ≤ p ∧ p − c ≤ tol) keeps only true matches;
    // recall-complete at radius tol BY CONSTRUCTION. The oracle runs
    // the PLAIN tolerance join — the hash match IS the equivalence
    // proof (the interval_bucketed contract). The unbounded
    // n_matched_any column of the plain key is deliberately absent:
    // bounded lookback is what buys the equi-join.
    "join_asof_tolerance_bucketed" -> ((s, d) => {
      val tolUs = 10L * 60 * 1000000
      val e = Tables.events(s, d).withColumn("us", unix_micros(col("ts")))
      val p = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("p_id"),
          col("us").as("p_us"))
      val probes = p.withColumn("cell",
        explode(expr(s"array(p_us div $tolUs, p_us div $tolUs - 1)")))
      val c = e.filter(col("event_type") === "click")
        .select(col("user_id").as("c_user"), col("us").as("c_us"))
        .withColumn("cell", expr(s"c_us div $tolUs"))
      val m = probes.join(c,
          probes("user_id") === c("c_user") && probes("cell") === c("cell"))
        .filter(col("c_us") <= col("p_us")
          && col("p_us") - col("c_us") <= tolUs)
        .groupBy("p_id").agg(max(col("c_us")).as("m_us"))
      p.join(m, Seq("p_id"), "left")
        .agg(count(lit(1)).as("n_purchases"),
          count(col("m_us")).as("n_within_tol"),
          coalesce(sum(col("p_us") - col("m_us")), lit(0L)).cast("bigint")
            .as("gap_us_within"))
    }),

    // As-of NEAREST (r8) — completes the merge_asof direction triple
    // (backward = join_asof_native, forward = join_asof_forward):
    // each purchase matched to the click minimizing |c_us − p_us|,
    // ties broken BACKWARD (the pandas rule). Same join + groupBy
    // shape; "which side won" is decided by comparing the per-side
    // minima — no argmin row is ever materialized, so there is no
    // engine-defined tiebreak to diverge on. Fingerprint counts both
    // sides of the tie rule so the rule itself is hash-checked.
    "join_asof_nearest" -> ((s, d) => {
      val e = Tables.events(s, d).withColumn("us", unix_micros(col("ts")))
      val p = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("p_id"),
          col("us").as("p_us"))
      val c = e.filter(col("event_type") === "click")
        .select(col("user_id").as("c_user"), col("us").as("c_us"))
      p.join(c, col("user_id") === col("c_user"), "left")
        .groupBy("p_id", "p_us")
        .agg(min(abs(col("c_us") - col("p_us"))).as("min_abs"),
          min(when(col("c_us") <= col("p_us"),
            col("p_us") - col("c_us"))).as("min_back"))
        .agg(count(lit(1)).as("n_purchases"),
          count(col("min_abs")).as("n_matched"),
          coalesce(sum(col("min_abs")), lit(0L)).cast("bigint")
            .as("gap_us_total"),
          count(when(col("min_back") === col("min_abs"), 1))
            .as("n_nearest_backward"),
          count(when(col("min_abs").isNotNull &&
            (col("min_back").isNull ||
              col("min_back") > col("min_abs")), 1))
            .as("n_nearest_forward_only"))
    }),

    // As-of: each purchase matched to the user's latest PRIOR click
    // (join + groupBy-max formulation — identical semantics declared
    // in the oracle so both engines agree; see SURVEY §2.3).
    "join_asof_last_event" -> ((s, d) => {
      val e = Tables.events(s, d)
      val p = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("p_id"), col("ts").as("p_ts"))
      val c = e.filter(col("event_type") === "click")
        .select(col("user_id").as("c_user"), col("ts").as("c_ts"))
      p.join(c, col("user_id") === col("c_user") && col("c_ts") <= col("p_ts"), "left")
        .groupBy("p_id", "p_ts")
        .agg(max(col("c_ts")).as("last_click"))
        .select(
          col("p_id"),
          col("last_click").isNotNull.as("has_click"),
          ((unix_micros(col("p_ts")) - unix_micros(col("last_click"))) / lit(1e6))
            .as("gap_sec"))
        .groupBy("has_click")
        .agg(
          count(lit(1)).as("n_purchases"),
          round(avg(col("gap_sec")), 4).as("avg_gap_sec"))
        .orderBy("has_click")
    }),

    // Point-in-time join (r12) — the FEATURE-STORE primitive the asof
    // family doesn't cover: each event joined to the DIMENSION
    // VERSION valid at event time (SCD2-style explicit
    // [valid_from, valid_to) windows), so training features are
    // exactly what production would have seen at that moment — the
    // temporal-leakage guard (joining the CURRENT dim row trains on
    // the future). The versioned dim derives deterministically from
    // customer (3 versions per key at fixed day boundaries, a
    // ±100-per-version balance drift as the versioned attribute).
    // Scale shape: equi-join on the key with the validity range as a
    // co-partitioned post-filter — per-key blowup is bounded by the
    // version count (≤3), never a cartesian; exactly how a 100 TB
    // feature store lays out PIT lookups (key-bucketed, version
    // ranges scanned within the key's rows). Each event matches
    // EXACTLY one version — spec-pinned.
    "join_point_in_time" -> ((s, d) => {
      val dim = Tables.customer(s, d)
        .select(col("c_custkey").as("uid"), col("c_acctbal"))
        .withColumn("v", explode(expr("sequence(0, 2)")))
        .select(col("uid"), col("v"),
          (col("c_acctbal") + col("v") * 100).cast("decimal(18,2)")
            .as("bal_v"),
          to_timestamp(when(col("v") === 0, lit("1970-01-01 00:00:00"))
            .when(col("v") === 1, lit("2024-01-11 00:00:00"))
            .otherwise(lit("2024-01-21 00:00:00"))).as("valid_from"),
          to_timestamp(when(col("v") === 0, lit("2024-01-11 00:00:00"))
            .when(col("v") === 1, lit("2024-01-21 00:00:00"))
            .otherwise(lit("9999-01-01 00:00:00"))).as("valid_to"))
      Tables.events(s, d)
        .select(col("user_id"), col("ts"), col("event_type"))
        .join(dim, col("user_id") === col("uid")
          && col("ts") >= col("valid_from") && col("ts") < col("valid_to"))
        .groupBy("v", "event_type")
        .agg(count(lit(1)).as("n_events"),
          round(sum(col("bal_v")).cast("double"), 4).as("sum_bal"))
        .orderBy("v", "event_type")
    }),
  )

  val oracles: Map[String, String] = Map(
    "join_point_in_time" ->
      """WITH dim AS (SELECT c_custkey AS uid, v,
                             CAST(c_acctbal + v * 100 AS DECIMAL(18,2))
                               AS bal_v,
                             CASE v WHEN 0 THEN TIMESTAMP '1970-01-01'
                                    WHEN 1 THEN TIMESTAMP '2024-01-11'
                                    ELSE TIMESTAMP '2024-01-21'
                             END AS valid_from,
                             CASE v WHEN 0 THEN TIMESTAMP '2024-01-11'
                                    WHEN 1 THEN TIMESTAMP '2024-01-21'
                                    ELSE TIMESTAMP '9999-01-01'
                             END AS valid_to
                      FROM customer, (SELECT unnest([0, 1, 2]) AS v))
         SELECT v, event_type, count(*) AS n_events,
                round(CAST(sum(bal_v) AS DOUBLE), 4) AS sum_bal
         FROM events e JOIN dim
           ON dim.uid = e.user_id
              AND e.ts >= dim.valid_from AND e.ts < dim.valid_to
         GROUP BY v, event_type ORDER BY v, event_type""",
    "join_shuffle_large" ->
      """SELECT o_orderstatus, count(*) AS n_items,
                round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 4)
                  AS revenue
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    "join_multiway_star" ->
      """SELECT r_name, c_mktsegment, count(*) AS n_items,
                round(CAST(sum(CAST(l_extendedprice * (1.0 - l_discount)
                      AS DECIMAL(18,4))) AS DOUBLE), 4) AS revenue
         FROM lineitem
         JOIN orders   ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN supplier ON l_suppkey = s_suppkey
         JOIN nation   ON s_nationkey = n_nationkey
         JOIN region   ON n_regionkey = r_regionkey
         GROUP BY r_name, c_mktsegment ORDER BY r_name, c_mktsegment""",
    "join_left_right_full" ->
      """WITH dd AS (SELECT doc_id, n_chars FROM documents WHERE doc_id % 3 <> 0),
              ee AS (SELECT vec_id, label FROM embeddings WHERE label < 7)
         SELECT '1_left' AS kind, count(*) AS n_rows,
                count(doc_id) AS n_left, count(vec_id) AS n_right
         FROM dd LEFT JOIN ee ON doc_id = vec_id
         UNION ALL
         SELECT '2_right', count(*), count(doc_id), count(vec_id)
         FROM dd RIGHT JOIN ee ON doc_id = vec_id
         UNION ALL
         SELECT '3_full', count(*), count(doc_id), count(vec_id)
         FROM dd FULL JOIN ee ON doc_id = vec_id
         ORDER BY kind""",
    "join_semi" ->
      """SELECT c_mktsegment, count(*) AS n_customers
         FROM customer c
         WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
         GROUP BY c_mktsegment ORDER BY c_mktsegment""",
    "join_anti" ->
      """SELECT c_mktsegment, count(*) AS n_customers
         FROM customer c
         WHERE NOT EXISTS (SELECT 1 FROM orders o
                           WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
         GROUP BY c_mktsegment ORDER BY c_mktsegment""",
    "join_cross" ->
      """SELECT r_name, o_orderstatus
         FROM region CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders)
         ORDER BY r_name, o_orderstatus""",
    "join_null_safe" ->
      """WITH c AS (SELECT nullif(c_nationkey, 13) AS ck FROM customer),
              s AS (SELECT nullif(s_nationkey, 13) AS sk FROM supplier)
         SELECT ck, count(*) AS n_pairs
         FROM c JOIN s ON ck IS NOT DISTINCT FROM sk
         GROUP BY ck ORDER BY ck NULLS FIRST""",
    "join_theta_range" ->
      """WITH bands AS (SELECT r_regionkey AS band_id,
                               r_regionkey * 20.0 + 900.0 AS lo,
                               r_regionkey * 20.0 + 930.0 AS hi
                        FROM region)
         SELECT band_id, count(*) AS n_parts,
                round(avg(p_retailprice), 4) AS avg_price
         FROM part JOIN bands ON p_retailprice >= lo AND p_retailprice < hi
         GROUP BY band_id ORDER BY band_id""",
    "join_interval_events" ->
      """SELECT a.event_type AS a_type, count(*) AS n_pairs
         FROM events a JOIN events b
           ON a.user_id = b.user_id
          AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 5 MINUTE
         GROUP BY a.event_type ORDER BY a_type""",
    "join_asof_forward" ->
      """WITH e AS (SELECT user_id, event_id, event_type,
                           epoch_us(ts) AS us FROM events),
              p AS (SELECT user_id, event_id AS p_id, us AS p_us
                    FROM e WHERE event_type = 'purchase'),
              c AS (SELECT user_id AS c_user, us AS c_us
                    FROM e WHERE event_type = 'click'),
              m AS (SELECT p_id, p_us, min(c_us) AS m_us
                    FROM p LEFT JOIN c
                      ON user_id = c_user AND c_us >= p_us
                    GROUP BY p_id, p_us)
         SELECT count(*) AS n_purchases,
                count(m_us) AS n_followed,
                CAST(coalesce(sum(m_us - p_us), 0) AS BIGINT)
                  AS gap_us_total
         FROM m""",
    "join_asof_nearest" ->
      """WITH e AS (SELECT user_id, event_id, event_type,
                           epoch_us(ts) AS us FROM events),
              p AS (SELECT user_id, event_id AS p_id, us AS p_us
                    FROM e WHERE event_type = 'purchase'),
              c AS (SELECT user_id AS c_user, us AS c_us
                    FROM e WHERE event_type = 'click'),
              m AS (SELECT p_id, p_us,
                           min(abs(c_us - p_us)) AS min_abs,
                           min(CASE WHEN c_us <= p_us
                                    THEN p_us - c_us END) AS min_back
                    FROM p LEFT JOIN c ON user_id = c_user
                    GROUP BY p_id, p_us)
         SELECT count(*) AS n_purchases,
                count(min_abs) AS n_matched,
                CAST(coalesce(sum(min_abs), 0) AS BIGINT)
                  AS gap_us_total,
                count(CASE WHEN min_back = min_abs THEN 1 END)
                  AS n_nearest_backward,
                count(CASE WHEN min_abs IS NOT NULL
                             AND (min_back IS NULL
                                  OR min_back > min_abs) THEN 1 END)
                  AS n_nearest_forward_only
         FROM m""",
    // DuckDB replays the same groupBy-max + tolerance cut; ASOF JOIN
    // with a tolerance is not native there either, which is the point:
    // the rewrite IS the portable formulation
    "join_asof_tolerance" ->
      """WITH e AS (SELECT user_id, event_id, event_type,
                           epoch_us(ts) AS us FROM events),
              p AS (SELECT user_id, event_id AS p_id, us AS p_us
                    FROM e WHERE event_type = 'purchase'),
              c AS (SELECT user_id AS c_user, us AS c_us
                    FROM e WHERE event_type = 'click'),
              m AS (SELECT p_id, p_us, max(c_us) AS m_us
                    FROM p LEFT JOIN c
                      ON user_id = c_user AND c_us <= p_us
                    GROUP BY p_id, p_us)
         SELECT count(*) AS n_purchases,
                count(m_us) AS n_matched_any,
                count(CASE WHEN p_us - m_us <= 600000000 THEN 1 END)
                  AS n_within_tol,
                CAST(coalesce(sum(CASE WHEN p_us - m_us <= 600000000
                  THEN p_us - m_us END), 0) AS BIGINT) AS gap_us_within
         FROM m""",
    "join_asof_tolerance_bucketed" ->
      """WITH e AS (SELECT user_id, event_id, event_type,
                           epoch_us(ts) AS us FROM events),
              p AS (SELECT user_id, event_id AS p_id, us AS p_us
                    FROM e WHERE event_type = 'purchase'),
              c AS (SELECT user_id AS c_user, us AS c_us
                    FROM e WHERE event_type = 'click'),
              m AS (SELECT p_id, p_us, max(c_us) AS m_us
                    FROM p LEFT JOIN c
                      ON user_id = c_user AND c_us <= p_us
                         AND p_us - c_us <= 600000000
                    GROUP BY p_id, p_us)
         SELECT count(*) AS n_purchases,
                count(m_us) AS n_within_tol,
                CAST(coalesce(sum(p_us - m_us), 0) AS BIGINT)
                  AS gap_us_within
         FROM m""",
    "join_asof_native" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us
                    FROM events),
              p AS (SELECT user_id, us FROM e WHERE event_type = 'purchase'),
              c AS (SELECT user_id, us FROM e WHERE event_type = 'click')
         SELECT count(*) AS n_matched,
                CAST(sum(p.us - c.us) AS BIGINT) AS sum_gap_us
         FROM p ASOF JOIN c
           ON p.user_id = c.user_id AND c.us <= p.us""",
    "join_asof_last_event" ->
      """WITH p AS (SELECT user_id, event_id AS p_id, ts AS p_ts
                    FROM events WHERE event_type = 'purchase'),
              c AS (SELECT user_id AS c_user, ts AS c_ts
                    FROM events WHERE event_type = 'click'),
              m AS (SELECT p_id, p_ts, max(c_ts) AS last_click
                    FROM p LEFT JOIN c ON user_id = c_user AND c_ts <= p_ts
                    GROUP BY p_id, p_ts)
         SELECT last_click IS NOT NULL AS has_click,
                count(*) AS n_purchases,
                round(avg((epoch_us(p_ts) - epoch_us(last_click)) / 1e6), 4)
                  AS avg_gap_sec
         FROM m GROUP BY 1 ORDER BY has_click""",
  )
}
