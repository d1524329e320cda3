package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Third analytics wave (round-4 continuation): OHLC resampling,
  * robust (MAD) outlier detection, RFM segmentation, and entropy
  * profiling.
  *
  * Scale notes (100 TB):
  *   - `timeseries_ohlc`: one hash aggregate keyed by (group, hour) —
  *     open/close are arg-min/arg-max over a fixed-width sortable key,
  *     so the whole bar computes in a single partial+final pass with
  *     no window sort (the window formulation would sort every
  *     partition by ts first).
  *   - `anomaly_mad`: per-group median/MAD need exact quantiles — two
  *     aggregation passes over a 5-row-keyed group space; the
  *     deviations join is a broadcast of the tiny stats table, as in
  *     anomaly_zscore. At petabyte scale swap the exact median for
  *     the mergeable approx-percentile sketch (agg_percentile_approx)
  *     — same shape, bounded state.
  *   - `analytics_rfm`: one aggregation over orders (150k rows →
  *     one row per customer), then ntile windows over the AGGREGATED
  *     table — windows never see raw orders.
  *   - `agg_entropy`: two chained hash aggregates ((bucket,type) then
  *     bucket); the shuffle carries category counts, never events.
  */
object Analytics3 {
  type Q = (SparkSession, String) => DataFrame

  private def trunc4(c: Column): Column =
    floor(c * 10000).cast("double") / 10000.0

  /** Fixed-width sortable (µs, event_id) key: lexicographic order ==
    * numeric order for zero-padded non-negatives (Analytics2's
    * agg_minmax_by pattern — bare min_by/max_by is tie-undefined). */
  private val sortKey = "printf('%020d|%012d', us, event_id)"

  val queries: Map[String, Q] = Map(
    // Hourly OHLC bars per event_type: open/close = value at the
    // first/last event of the hour (deterministic via the sortable
    // key), high/low = extremes. Raw doubles pass through bit-exact —
    // no arithmetic, no rounding needed.
    "timeseries_ohlc" -> ((s, d) =>
      Tables.events(s, d)
        .select(col("event_type"), col("value"), col("event_id"),
          unix_micros(col("ts")).as("us"),
          date_trunc("hour", col("ts")).as("h"))
        .groupBy("event_type", "h")
        .agg(
          expr(s"min_by(value, $sortKey)").as("open"),
          max(col("value")).as("high"),
          min(col("value")).as("low"),
          expr(s"max_by(value, $sortKey)").as("close"),
          count(lit(1)).as("n"))
        .orderBy("event_type", "h")),

    // Exponential smoothing over a BOUNDED trailing frame (round 6):
    // ewma8 = Σ w_k·x_{t−k} / Σ w_k, w_k = 0.5^k over the last 8
    // events per type — the denoising primitive beside gap_fill/OHLC
    // in the timeseries family. The bounded frame (vs the recursive
    // infinite-history EWMA) is what keeps the operator a pure window
    // expression: no iterative state, shuffles once on the partition
    // key. Determinism: 0.5^k is EXACT in binary for every k, each
    // term is one multiply of identical doubles, and both engines sum
    // the frame list in index order (left fold ≡ list_aggregate), so
    // the quotient is bit-identical before the floor-scale.
    "timeseries_ewma" -> ((s, d) => {
      val w = Window.partitionBy("event_type")
        .orderBy(col("us"), col("event_id"))
        .rowsBetween(-7, Window.currentRow)
      Tables.events(s, d)
        .select(col("event_id"), col("event_type"), col("value"),
          unix_micros(col("ts")).as("us"))
        .withColumn("ls", collect_list(col("value")).over(w))
        .filter(col("event_id") % 101 === 0)
        .select(col("event_id"), col("event_type"), col("value"),
          trunc4(expr(
            """aggregate(transform(sequence(1, size(ls)),
                 p -> element_at(ls, p) * pow(0.5D, size(ls) - p)),
               0D, (a, x) -> a + x)
               / aggregate(transform(sequence(1, size(ls)),
                 p -> pow(0.5D, size(ls) - p)), 0D, (a, x) -> a + x)"""))
            .as("ewma8"))
        .orderBy("event_id")
    }),

    // Linear-interpolation gap fill (round 6): the reconstruction
    // primitive beside the zero-fill `timeseries_gap_fill` — missing
    // grid hours take the line between the PREVIOUS and NEXT observed
    // hourly means instead of zero. Shape: one hourly pre-aggregation
    // (shuffle carries (type, hour) partials, never events), grid
    // explode, then two bounded-state window passes (last-non-null
    // backward, first-non-null forward) — no self-joins, no per-gap
    // scans, which is what keeps a year-long 100 TB backfill one
    // linear job. Determinism: hourly mean = exact decimal sum /
    // count (identical double bits both engines), the interpolation
    // weight is a double division of µs BIGINT differences, and both
    // engines evaluate pv + (nv − pv) · w on identical doubles →
    // floor-scale is drift-free. Grid endpoints are observed by
    // construction (span = min..max observed hour), so interior gaps
    // always have both neighbors.
    "timeseries_interpolate_linear" -> ((s, d) => {
      val hourly = Tables.events(s, d)
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
        .agg((sum(col("value").cast("decimal(18,2)")).cast("double")
          / count(lit(1))).as("v"))
      val grid = hourly.groupBy("event_type")
        .agg(min(col("h")).as("h0"), max(col("h")).as("h1"))
        .select(col("event_type"),
          explode(expr("sequence(h0, h1, interval 1 hour)")).as("h"))
      val g = grid.join(hourly, Seq("event_type", "h"), "left")
        .withColumn("us", unix_micros(col("h")))
      val wb = Window.partitionBy("event_type").orderBy("us")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wf = Window.partitionBy("event_type").orderBy("us")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      g.withColumn("pv", last(col("v"), ignoreNulls = true).over(wb))
        .withColumn("pu", last(when(col("v").isNotNull, col("us")),
          ignoreNulls = true).over(wb))
        .withColumn("nv", first(col("v"), ignoreNulls = true).over(wf))
        .withColumn("nu", first(when(col("v").isNotNull, col("us")),
          ignoreNulls = true).over(wf))
        .select(col("event_type"), col("h"),
          col("v").isNotNull.as("observed"),
          trunc4(when(col("v").isNotNull, col("v"))
            .otherwise(col("pv") + (col("nv") - col("pv")) *
              ((col("us") - col("pu")).cast("double")
                / (col("nu") - col("pu")).cast("double"))))
            .as("v_interp"))
        .orderBy("event_type", "h")
    }),

    // KMV (k-minimum-values) distinct-count sketch, ORACLE-CHECKED
    // (round 6) — the third md5-derived sketch, covering the
    // cardinality-estimation role the HLL keys play no-oracle: map
    // each key to a uniform in (0,1] via its md5 prefix (48 bits —
    // exact as a double), keep the k=64 smallest per group, estimate
    // distinct = (k−1)/u_(k). Groups with < k distinct values return
    // the exact count (the standard KMV rule). The sketch state is k
    // doubles per group — mergeable by keeping the k smallest of a
    // union, same broadcast/merge story as HLL but digit-for-digit
    // reproducible in DuckDB. Output: exact distinct vs estimate vs
    // signed relative error, all hash-checked.
    "agg_kmv_distinct" -> ((s, d) => {
      val k = 64
      val u = "CAST(conv(substring(md5(CAST(o_custkey AS STRING)), 1, 12), " +
        "16, 10) AS DOUBLE) / 281474976710656.0"
      val hashed = Tables.orders(s, d)
        .select(col("o_orderpriority").as("prio"), col("o_custkey"))
        .distinct()
        .withColumn("u", expr(u))
      val w = Window.partitionBy("prio").orderBy(col("u"), col("o_custkey"))
      val ranked = hashed.withColumn("rn", row_number().over(w))
      ranked.groupBy("prio")
        .agg(count(lit(1)).as("n_exact"),
          max(when(col("rn") === k, col("u"))).as("uk"))
        .select(col("prio"), col("n_exact"),
          trunc4(when(col("n_exact") < k, col("n_exact").cast("double"))
            .otherwise(lit((k - 1).toDouble) / col("uk"))).as("est"),
          trunc4((when(col("n_exact") < k, col("n_exact").cast("double"))
            .otherwise(lit((k - 1).toDouble) / col("uk"))
            - col("n_exact")) / col("n_exact")).as("rel_err"))
        .orderBy("prio")
    }),

    // KMV set-operation estimates (r7) — completing agg_kmv_distinct
    // with the UNION/INTERSECTION algebra that makes KMV synopses
    // composable: A = view users, B = click users; the union synopsis
    // is the k smallest hashes of A ∪ B (mergeable — exactly what
    // shards ship at 100 TB), and |A∩B| falls out of
    // inclusion–exclusion |A|+|B|−|A∪B|. All three estimates use the
    // same (k−1)/u_k estimator and the declared result carries the
    // EXACT intersection beside the estimate, so estimator quality is
    // hash-checked, not asserted.
    "agg_kmv_intersect" -> ((s, d) => {
      val k = 64
      val u = "CAST(conv(substring(md5(CAST(user_id AS STRING)), 1, 12), " +
        "16, 10) AS DOUBLE) / 281474976710656.0"
      val ev = Tables.events(s, d)
      def setOf(t: String, tag: String) =
        ev.filter(col("event_type") === t).select(col("user_id")).distinct()
          .withColumn("tag", lit(tag))
      val a = setOf("view", "a")
      val b = setOf("click", "b")
      val tagged = a.union(b)
        .union(a.select("user_id").union(b.select("user_id")).distinct()
          .withColumn("tag", lit("u")))
        .withColumn("uh", expr(u))
      val w = Window.partitionBy("tag").orderBy(col("uh"), col("user_id"))
      val est = tagged.withColumn("rn", row_number().over(w))
        .groupBy("tag")
        .agg(count(lit(1)).as("n_exact"),
          max(when(col("rn") === k, col("uh"))).as("uk"))
        .select(col("tag"), col("n_exact"),
          when(col("n_exact") < k, col("n_exact").cast("double"))
            .otherwise(lit((k - 1).toDouble) / col("uk")).as("est"))
      val wide = est.groupBy()
        .agg(max(when(col("tag") === "a", col("est"))).as("ea"),
          max(when(col("tag") === "b", col("est"))).as("eb"),
          max(when(col("tag") === "u", col("est"))).as("eu"),
          max(when(col("tag") === "a", col("n_exact"))).as("na"),
          max(when(col("tag") === "b", col("n_exact"))).as("nb"),
          max(when(col("tag") === "u", col("n_exact"))).as("nu"))
      wide.select(
        col("na"), col("nb"), col("nu"),
        (col("na") + col("nb") - col("nu")).as("exact_intersect"),
        (floor((col("ea") + col("eb") - col("eu")) * 10000)
          .cast("double") / 10000.0).as("est_intersect"))
    }),

    // Deterministic Bloom filter, ORACLE-CHECKED (round 6) — the
    // second md5-derived sketch beside `agg_countmin_heavy`, in the
    // incremental-dedup role `dedup_incremental_ingest` plays exactly:
    // build a k=4, m=4096-bit filter over the EXISTING corpus's
    // content hashes, probe a new batch, and split it into
    // definitely-new vs maybe-dup (the maybe-dups go to the exact
    // check; definite-news skip it — at 100 TB the filter is a few MB
    // broadcast against yesterday's billions of hashes, and the exact
    // join runs on the maybe fraction only). Bit positions are
    // md5-derived (seed:key, 3 hex chars mod 4096), so DuckDB rebuilds
    // the EXACT bit set and probe verdicts. Declared output: per
    // verdict bucket, the batch count and how many are TRULY dup —
    // "maybe" rows contain ALL true dups (no false negatives, the
    // Bloom guarantee) and the false-positive count is part of the
    // hash-checked result.
    "agg_bloom_membership" -> ((s, d) => {
      val existing = Tables.documents(s, d)
        .filter(col("doc_id") % 3 =!= 0).select(md5(col("text")).as("h"))
      val batch = Tables.documents(s, d)
        .filter(col("doc_id") % 3 === 0)
        .select(col("doc_id"), md5(col("text")).as("h"))
      val posExpr = (src: String) =>
        s"""transform(sequence(0, 3), k ->
              CAST(conv(substring(md5(concat(CAST(k AS STRING), ':', $src)),
                        1, 3), 16, 10) AS BIGINT) % 4096)"""
      val bits = existing
        .select(explode(expr(posExpr("h"))).as("bit")).distinct()
      val probe = batch
        .select(col("doc_id"), col("h"),
          explode(expr(posExpr("h"))).as("bit"))
      val verdicts = probe
        .join(bits.withColumn("set", lit(1)), Seq("bit"), "left")
        .groupBy("doc_id", "h")
        .agg((count(when(col("set").isNotNull, lit(1))) === 4).as("maybe_dup"))
      val truth = existing.distinct().withColumn("truly_dup", lit(1))
      verdicts.join(truth, Seq("h"), "left")
        .groupBy("maybe_dup")
        .agg(count(lit(1)).as("n_batch"),
          count(col("truly_dup")).as("n_truly_dup"))
        .orderBy("maybe_dup")
    }),

    // Daily growth accounting (round 6): new vs cumulative distinct
    // users per day — THE growth metric, computed without any
    // running-distinct state: each user's FIRST event (row_number = 1
    // under the total (us, event_id) order per user) marks their
    // acquisition day, dailies aggregate those marks, and the
    // cumulative count is a running sum over the tiny per-day frame.
    // Two bounded shuffles (user_id, then day); the distinct-tracking
    // that naively needs a growing set is free because first-seen is
    // a per-user property. Counts are window sums of BIGINTs (cast in
    // the oracle — HUGEINT-proofed).
    "analytics_daily_active_growth" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
      val firsts = Tables.events(s, d)
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("us"), to_date(col("ts")).as("day"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
      val daily = firsts.groupBy("day").agg(count(lit(1)).as("new_users"))
      daily
        .withColumn("cum_users",
          sum(col("new_users")).over(Window.orderBy("day")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .orderBy("day")
    }),

    // First-order Markov transition matrix over user event paths
    // (round 6) — the user-journey model beside funnel/retention/
    // attribution: P(next = b | cur = a) estimated from consecutive
    // event pairs per user. ONE lag window pass (shuffle on user_id)
    // derives the transition frame; both count tables are
    // |event_types|²-sized aggregates. Probability = count ratio —
    // one double division of identical BIGINTs, floor-scaled.
    "analytics_user_path_markov" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
      val trans = Tables.events(s, d)
        .select(col("user_id"), col("event_type"), col("event_id"),
          unix_micros(col("ts")).as("us"))
        .withColumn("prev", lag(col("event_type"), 1).over(w))
        .filter(col("prev").isNotNull)
      val pair = trans.groupBy(col("prev"), col("event_type").as("next"))
        .agg(count(lit(1)).as("n"))
      val tot = pair.groupBy("prev").agg(sum(col("n")).as("t"))
      pair.join(tot, "prev")
        .select(col("prev"), col("next"), col("n"),
          trunc4(col("n").cast("double") / col("t").cast("double"))
            .as("p"))
        .orderBy("prev", "next")
    }),

    // Absorbing-state hitting probability (r12) — the question the
    // transition matrix above exists to answer: from each state, the
    // probability of REACHING 'purchase' within K=4 steps under the
    // empirical chain with 'purchase' made absorbing (conversion
    // attribution's "how far is each state from the money"). Four
    // unrolled rounds of h ← P·h over the state synopsis (≤ 5×5
    // transition rows — everything after the one event-grain window
    // pass is group-grain). Determinism: h is carried as an INTEGER
    // quantile hq = ⌊h·10¹²⌋ (BIGINT); each update's numerator
    // Σ n·hq accumulates DECIMAL(38,0)/HUGEINT (n·hq wraps int64
    // once n reaches ~10⁷ per pair — the 100 TB point), and the
    // single double division per (state, round) floor-requantizes to
    // the 10⁻¹² grid — both engines walk identical integers round by
    // round (the cuped/pps discipline applied to a fixpoint loop).
    "analytics_markov_hitting" -> ((s, d) => {
      val Q = 1000000000000L
      val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
      val trans = Tables.events(s, d)
        .select(col("user_id"), col("event_type"), col("event_id"),
          unix_micros(col("ts")).as("us"))
        .withColumn("prev", lag(col("event_type"), 1).over(w))
        .filter(col("prev").isNotNull)
      val pair = trans.groupBy(col("prev"), col("event_type").as("next"))
        .agg(count(lit(1)).as("n")).localCheckpoint()
      val tot = pair.groupBy("prev").agg(sum(col("n")).as("t"))
      val states = pair.select(col("prev").as("state"))
        .union(pair.select(col("next"))).distinct().localCheckpoint()
      var h = states.withColumn("hq",
        when(col("state") === "purchase", lit(Q)).otherwise(lit(0L)))
      for (_ <- 1 to 4) {
        val num = pair
          .join(h.select(col("state").as("next"), col("hq")), Seq("next"))
          .groupBy("prev")
          .agg(sum(col("n").cast("decimal(38,0)") * col("hq")).as("numq"))
        val h2 = states
          .join(num.select(col("prev").as("state"), col("numq")),
            Seq("state"), "left")
          .join(tot.select(col("prev").as("state"), col("t")),
            Seq("state"), "left")
          .select(col("state"),
            when(col("state") === "purchase", lit(Q))
              .otherwise(coalesce(
                floor(col("numq").cast("double") / col("t").cast("double"))
                  .cast("long"), lit(0L))).as("hq"))
          .localCheckpoint()
        graft.Ckpt.free(h) // superseded round (no-op on the lazy h0; r15 #5)
        h = h2
      }
      h.join(tot.select(col("prev").as("state"), col("t")),
          Seq("state"), "left")
        .select(col("state"), coalesce(col("t"), lit(0L)).as("n_out"),
          (col("hq").cast("double") / 1e12).as("hit4"))
        .orderBy("state")
    }),

    // Equi-height histogram (round 6) — the quantile-bucket companion
    // of the equi-width `agg_histogram`: ntile(8) over each segment's
    // ordered values gives buckets holding equal ROW counts however
    // skewed the distribution (the property equi-width loses on heavy
    // tails). Partitioned PER PRIORITY — a global ntile would move
    // the table to one partition; segment windows shuffle once on the
    // segment key and sort in parallel. (Corpus-wide equi-height at
    // 100 TB uses approx-percentile EDGES instead —
    // `agg_percentile_approx` is that path; this key is the exact
    // per-segment form.) ntile is deterministic under the total
    // (value, id) order; bucket edges are exact min/max doubles.
    "agg_histogram_equiheight" -> ((s, d) => {
      Tables.orders(s, d)
        .select(col("o_orderpriority").as("prio"), col("o_orderkey"),
          col("o_totalprice"))
        .withColumn("bucket", ntile(8).over(
          Window.partitionBy("prio")
            .orderBy(col("o_totalprice"), col("o_orderkey"))))
        .groupBy("prio", "bucket")
        .agg(count(lit(1)).as("n"),
          min(col("o_totalprice")).as("lo"),
          max(col("o_totalprice")).as("hi"))
        .orderBy("prio", "bucket")
    }),

    // Last-touch attribution (round 6) — the revenue-credit primitive
    // beside funnel/retention/RFM: each purchase credits the LAST
    // view-or-click by the same user within the preceding 7 days.
    // ONE window pass over user-partitioned events (a µs RANGE frame
    // [−7 d, −1 µs]); no purchase×event self-join, so the shape stays
    // linear at 100 TB however long the user histories get (the
    // ORACLE does run the self-join formulation — the window rewrite
    // must preserve it exactly). Determinism: the credited event is
    // max(struct(us, event_id, type)) — field-order struct compare
    // breaks same-µs ties by event_id identically in both engines.
    "analytics_attribution_last_touch" -> ((s, d) => {
      val sevenDaysUs = 7L * 86400L * 1000000L
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("event_type"), col("event_id"),
          unix_micros(col("ts")).as("us"))
      val w = Window.partitionBy("user_id").orderBy("us")
        .rangeBetween(-sevenDaysUs, -1L)
      ev.withColumn("src",
          max(when(col("event_type").isin("view", "click"),
            struct(col("us"), col("event_id"),
              col("event_type").as("etype")))).over(w))
        .filter(col("event_type") === "purchase")
        .select(coalesce(col("src.etype"), lit("none")).as("channel"))
        .groupBy("channel")
        .agg(count(lit(1)).as("n_purchases"))
        .orderBy("channel")
    }),

    // Count–min sketch, ORACLE-CHECKED (round 6) — unlike the
    // DataSketches families (HLL / approx top-k / KLL), whose
    // internals are categorically not SQL-mirrorable, a CMS built on
    // md5-derived row hashes is: both engines rebuild the d=4 × w=64
    // counter table and the per-key min-over-rows estimate
    // digit-for-digit. The sketch table is 256 rows REGARDLESS of key
    // cardinality — a broadcastable synopsis; at 100 TB shards build
    // partial counter tables map-side and merge by addition (the same
    // mergeability story as the HLL keys, here with an exact oracle).
    // Declared output: per probe key (user_id % 100 = 0), exact count
    // vs CMS estimate and the non-negative overcount — the
    // one-sided-error guarantee est ≥ exact is part of the
    // hash-checked result (and property-tested in Analytics3Spec).
    "agg_countmin_heavy" -> ((s, d) => {
      val ev = Tables.events(s, d).select(col("user_id"))
      val bucket = "CAST(conv(substring(md5(concat(CAST(r AS STRING), " +
        "':', CAST(user_id AS STRING))), 1, 2), 16, 10) AS BIGINT) % 64"
      val cnt = ev
        .select(col("user_id"), explode(expr("sequence(0, 3)")).as("r"))
        .select(col("r"), expr(bucket).as("b"))
        .groupBy("r", "b").agg(count(lit(1)).as("c"))
      val probes = ev.filter(col("user_id") % 100 === 0)
        .groupBy("user_id").agg(count(lit(1)).as("n_exact"))
      probes
        .select(col("user_id"), col("n_exact"),
          explode(expr("sequence(0, 3)")).as("r"))
        .select(col("user_id"), col("n_exact"), col("r"),
          expr(bucket).as("b"))
        .join(broadcast(cnt), Seq("r", "b"))
        .groupBy("user_id", "n_exact")
        .agg(min(col("c")).as("n_est"))
        .select(col("user_id"), col("n_exact"), col("n_est"),
          (col("n_est") - col("n_exact")).as("overcount"))
        .orderBy("user_id")
    }),

    // Centered moving-average trend (round 6): the trend component of
    // a classical decomposition — per type, each hour's trend is the
    // mean of the 7 hourly means centered on it. The window sums
    // INTEGERS, not doubles or decimals: each hourly mean is
    // floor-scaled to a 10⁻⁴-units BIGINT first (floor on identical
    // double bits — drift-free), because (a) DuckDB evaluates sliding
    // window aggregates with a segment tree whose tree-order double
    // addition differs from Spark's per-frame re-accumulation, and
    // (b) CAST(double AS DECIMAL) re-quantization rounds .xxxx5
    // boundaries differently cross-engine (measured: 10/3570 rows off
    // by 1 ulp of the 4th decimal at sf0.1). Integer sums are
    // order-independent, so the quotient is bit-identical by
    // construction. One shuffle (event_type), bounded frames.
    "timeseries_trend_ma" -> ((s, d) => {
      val hourly = Tables.events(s, d)
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
        .agg((sum(col("value").cast("decimal(18,2)")).cast("double")
          / count(lit(1))).as("hv"))
        .withColumn("hv4i", floor(col("hv") * 10000).cast("long"))
      val w = Window.partitionBy("event_type").orderBy("h")
        .rowsBetween(-3, 3)
      hourly
        .withColumn("n_window", count(lit(1)).over(w))
        .withColumn("si", sum(col("hv4i")).over(w))
        .filter(col("n_window") === 7)
        .select(col("event_type"), col("h"),
          (col("hv4i").cast("double") / 10000.0).as("hv4"),
          trunc4(col("si").cast("double")
            / (col("n_window") * lit(10000L))).as("trend4"))
        .orderBy("event_type", "h")
    }),

    // Moving MEDIAN trend (round 6) — the robust companion of
    // `timeseries_trend_ma`: the centered 7-hour MEDIAN ignores a
    // single outlier hour entirely, where the mean drags. Same
    // integer discipline: hourly means floor-scaled to 10⁻⁴-unit
    // BIGINTs, the window collects the 7 integers, and the median is
    // the sorted list's middle element — exact selection on integers,
    // no cross-engine aggregate semantics in play at all.
    "timeseries_median_ma" -> ((s, d) => {
      val hourly = Tables.events(s, d)
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
        .agg((sum(col("value").cast("decimal(18,2)")).cast("double")
          / count(lit(1))).as("hv"))
        .withColumn("hv4i", floor(col("hv") * 10000).cast("long"))
      val w = Window.partitionBy("event_type").orderBy("h")
        .rowsBetween(-3, 3)
      hourly
        .withColumn("ls", collect_list(col("hv4i")).over(w))
        .filter(size(col("ls")) === 7)
        .select(col("event_type"), col("h"),
          (expr("element_at(array_sort(ls), 4)").cast("double") / 10000.0)
            .as("med4"))
        .orderBy("event_type", "h")
    }),

    // Robust outlier detection: median absolute deviation (MAD), the
    // outlier-resistant alternative to anomaly_zscore (a z-score's
    // mean/stddev are themselves dragged by the outliers they hunt).
    // Outlier ⇔ |v − median| > 3 × 1.4826 × MAD. Fixture margin to
    // the threshold is ≥ 1.8e-3 (measured both sfs) ≫ double drift.
    "anomaly_mad" -> ((s, d) => {
      val e = Tables.events(s, d).select(col("event_type"), col("value"))
      val med = e.groupBy("event_type")
        .agg(expr("percentile(value, 0.5)").as("m"))
      val dev = e.join(broadcast(med), "event_type")
        .select(col("event_type"), abs(col("value") - col("m")).as("dv"))
      val mad = dev.groupBy("event_type")
        .agg(expr("percentile(dv, 0.5)").as("mad"))
      dev.join(broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
          count(lit(1)).as("n"),
          count(when(col("dv") > lit(3 * 1.4826) * col("mad"), 1))
            .as("n_outliers"),
          // trunc4, not round(): §5.4.2 — round() diverges cross-engine
          // on .xxxx5 shortest-repr boundaries; floor on identical
          // double bits cannot (mad is a raw percentile, no arithmetic)
          trunc4(max(col("mad"))).as("mad4"))
        .orderBy("event_type")
    }),

    // RFM customer segmentation: recency (days since last order,
    // against the corpus max date), frequency (order count), monetary
    // (decimal-exact total) → ntile(5) buckets per dimension over the
    // one-row-per-customer aggregate, tie-broken by custkey →
    // segment-size distribution. r14 (VERDICT r13 weak #3): the
    // customer grain is table-proportional, so each ntile derives
    // from a ScaleRank.withGlobalRank pass instead of an
    // unpartitioned window, with n a 1-row broadcast scalar carried
    // through the three passes. r15 (ADVICE r14 high): SQL NTILE
    // FRONT-LOADS the n mod k larger buckets — with q = n DIV k and
    // r = n mod k, buckets 1..r hold q+1 rows and r+1..k hold q —
    // so the bucket is (rk−1) DIV (q+1) + 1 inside the first
    // r·(q+1) rows and (rk−1−r) DIV q + 1 after (exact integer
    // arithmetic, non-negative operands ⇒ Spark DIV == DuckDB
    // ntile). The earlier ⌊(rk−1)·k/n⌋+1 floor formula SPREADS the
    // remainder instead and diverges from NTILE whenever
    // n ≡ 2,3 (mod 5) — Analytics3Spec pins both residue classes
    // against the native window function. IF is lazy per row, so
    // the q=0 divisor of the n<k corner (where every row falls in
    // the first branch) is never evaluated.
    "analytics_rfm" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val maxD = o.agg(max(to_date(col("o_orderdate"))).as("dmax"))
      val cust = o.groupBy("o_custkey")
        .agg(max(to_date(col("o_orderdate"))).as("last_d"),
          count(lit(1)).as("freq"),
          sum(col("o_totalprice").cast("decimal(18,2)")).as("mon"))
        .crossJoin(broadcast(maxD))
        .select(col("o_custkey"),
          datediff(col("dmax"), col("last_d")).as("rec"),
          col("freq"), col("mon"))
      val n = cust.agg(count(lit(1)).as("gn"))
      def nt(df: org.apache.spark.sql.DataFrame, c: String,
             asc: Boolean, out: String) =
        ScaleRank.withGlobalRank(df,
          Seq(if (asc) col(c).asc else col(c).desc, col("o_custkey")))
          .withColumn(out, expr(
            """CAST(IF(rk <= (gn % 5L) * (gn DIV 5L + 1L),
                       (rk - 1L) DIV (gn DIV 5L + 1L),
                       (rk - 1L - gn % 5L) DIV (gn DIV 5L)) AS INT) + 1"""))
          .drop("rk", "gr_pid")
      val bucketed = nt(nt(nt(cust.crossJoin(broadcast(n)),
        "rec", asc = true, "r"),   // low recency = best
        "freq", asc = false, "f"),
        "mon", asc = false, "m")
      bucketed
        .groupBy("r", "f", "m")
        .agg(count(lit(1)).as("n_customers"),
          // decimal sum is exact/order-independent; ONE double cast +
          // correctly-rounded division + floor-scale → identical bits
          // (round() of the double-summed avg diverged at sf0.1)
          trunc4(sum(col("mon")).cast("double") / count(lit(1)))
            .as("avg_monetary"))
        .orderBy("r", "f", "m")
    }),

    // Shannon entropy of the event-type distribution per user bucket —
    // the category-balance diagnostic for a training corpus (uniform
    // 5-way ⇒ ln 5 ≈ 1.609; fixture sits just below). A bare double
    // Σ p·ln p is partition-order-dependent and crossed a floor4
    // boundary under local[32] (r4 driver run), so each term is
    // quantized to DECIMAL(28,10) first: the decimal sum is exact and
    // order-independent, the floor-scale runs in decimal space, and
    // only the final 4-decimal value is cast to double (both engines
    // convert a 4-decimal value to the identical double). Residual
    // cross-engine risk is a 1-ulp ln() difference flipping the 1e-10
    // quantization — 1e-6 per term, and even then it moves the exact
    // sum by 1e-10 ≪ the measured distance to the nearest 1e-4 floor
    // boundary.
    "agg_entropy" -> ((s, d) => {
      val c = Tables.events(s, d)
        .groupBy((col("user_id") % 16).as("bucket"), col("event_type"))
        .agg(count(lit(1)).as("n"))
      val t = c.groupBy("bucket").agg(sum(col("n")).as("tot"))
      val p = col("n").cast("double") / col("tot")
      c.join(t, "bucket")
        .groupBy("bucket")
        .agg(
          sum(col("n")).as("n_events"),
          (floor((-sum((p * log(p)).cast("decimal(28,10)"))) * 10000)
            .cast("double") / 10000.0).as("entropy"))
        .orderBy("bucket")
    }),
  )

  /** Hitting-probability oracle: the four h ← P·h rounds generated
    * from one template (the labelprop-chain pattern) so the per-round
    * quantization can't drift from the Spark loop's. */
  private def markovHittingSql: String = {
    val rounds = (1 to 4).map { r =>
      s"""n$r AS (SELECT p.prev,
                         CAST(sum(CAST(p.n AS HUGEINT) * h.hq) AS HUGEINT)
                           AS numq
                  FROM pair p JOIN h${r - 1} h ON h.state = p.next
                  GROUP BY p.prev),
          h$r AS (SELECT st.state,
                         CASE WHEN st.state = 'purchase'
                              THEN CAST(1000000000000 AS BIGINT)
                              ELSE CAST(coalesce(
                                floor(CAST(n.numq AS DOUBLE)
                                      / CAST(tot.t AS DOUBLE)), 0)
                                AS BIGINT)
                         END AS hq
                  FROM st LEFT JOIN n$r n ON n.prev = st.state
                          LEFT JOIN tot ON tot.prev = st.state)"""
    }.mkString(",\n")
    s"""WITH e AS (SELECT user_id, event_type, event_id,
                          epoch_us(ts) AS us
                   FROM events),
            t0 AS (SELECT user_id, event_type,
                          lag(event_type) OVER (PARTITION BY user_id
                            ORDER BY us, event_id) AS prev
                   FROM e),
            pair AS (SELECT prev, event_type AS next, count(*) AS n
                     FROM t0 WHERE prev IS NOT NULL
                     GROUP BY prev, event_type),
            tot AS (SELECT prev, CAST(sum(n) AS BIGINT) AS t
                    FROM pair GROUP BY prev),
            st AS (SELECT DISTINCT prev AS state FROM pair
                   UNION SELECT DISTINCT next FROM pair),
            h0 AS (SELECT state,
                          CAST(CASE WHEN state = 'purchase'
                               THEN 1000000000000 ELSE 0 END AS BIGINT)
                            AS hq
                   FROM st),
            $rounds
       SELECT h4.state, CAST(coalesce(tot.t, 0) AS BIGINT) AS n_out,
              CAST(h4.hq AS DOUBLE) / 1e12 AS hit4
       FROM h4 LEFT JOIN tot ON tot.prev = h4.state
       ORDER BY h4.state"""
  }

  val oracles: Map[String, String] = Map(
    "analytics_daily_active_growth" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us,
                           CAST(ts AS DATE) AS day
                    FROM events),
              f AS (SELECT user_id, day,
                           row_number() OVER (PARTITION BY user_id
                             ORDER BY us, event_id) AS rn
                    FROM e),
              daily AS (SELECT day, count(*) AS new_users
                        FROM f WHERE rn = 1 GROUP BY day)
         SELECT day, new_users,
                CAST(sum(new_users) OVER (ORDER BY day
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS cum_users
         FROM daily ORDER BY day""",
    "analytics_user_path_markov" ->
      """WITH e AS (SELECT user_id, event_type, event_id,
                           epoch_us(ts) AS us
                    FROM events),
              t AS (SELECT user_id, event_type,
                           lag(event_type) OVER (PARTITION BY user_id
                             ORDER BY us, event_id) AS prev
                    FROM e),
              pair AS (SELECT prev, event_type AS next, count(*) AS n
                       FROM t WHERE prev IS NOT NULL
                       GROUP BY prev, event_type),
              tot AS (SELECT prev, CAST(sum(n) AS BIGINT) AS t
                      FROM pair GROUP BY prev)
         SELECT pair.prev, pair.next, pair.n,
                CAST(floor(CAST(pair.n AS DOUBLE) / CAST(tot.t AS DOUBLE)
                           * 10000) AS DOUBLE) / 10000 AS p
         FROM pair JOIN tot ON tot.prev = pair.prev
         ORDER BY pair.prev, pair.next""",
    "analytics_markov_hitting" -> markovHittingSql,
    "agg_histogram_equiheight" ->
      """WITH b AS (SELECT o_orderpriority AS prio, o_orderkey,
                           o_totalprice,
                           ntile(8) OVER (PARTITION BY o_orderpriority
                             ORDER BY o_totalprice, o_orderkey) AS bucket
                    FROM orders)
         SELECT prio, bucket, count(*) AS n,
                min(o_totalprice) AS lo, max(o_totalprice) AS hi
         FROM b GROUP BY prio, bucket ORDER BY prio, bucket""",
    "agg_kmv_intersect" ->
      """WITH a AS (SELECT DISTINCT user_id FROM events
                    WHERE event_type = 'view'),
              b AS (SELECT DISTINCT user_id FROM events
                    WHERE event_type = 'click'),
              tagged AS (SELECT user_id, 'a' AS tag FROM a
                         UNION ALL SELECT user_id, 'b' FROM b
                         UNION ALL
                         SELECT user_id, 'u' FROM
                           (SELECT user_id FROM a UNION
                            SELECT user_id FROM b)),
              h AS (SELECT tag, user_id,
                           list_aggregate(list_transform(range(1, 13),
                             j -> (strpos('0123456789abcdef',
                                    substr(md5(CAST(user_id AS VARCHAR)),
                                           CAST(j AS INT), 1)) - 1)
                                  * pow(16, 12 - j)), 'sum')
                             / 281474976710656.0 AS uh
                    FROM tagged),
              rk AS (SELECT tag, uh,
                            row_number() OVER (PARTITION BY tag
                              ORDER BY uh, user_id) AS rn
                     FROM h),
              est AS (SELECT tag, count(*) AS n_exact,
                             max(CASE WHEN rn = 64 THEN uh END) AS uk
                      FROM rk GROUP BY tag),
              e2 AS (SELECT tag, n_exact,
                            CASE WHEN n_exact < 64
                                 THEN CAST(n_exact AS DOUBLE)
                                 ELSE 63.0 / uk END AS est
                     FROM est),
              wide AS (SELECT
                         max(CASE WHEN tag = 'a' THEN est END) AS ea,
                         max(CASE WHEN tag = 'b' THEN est END) AS eb,
                         max(CASE WHEN tag = 'u' THEN est END) AS eu,
                         max(CASE WHEN tag = 'a' THEN n_exact END) AS na,
                         max(CASE WHEN tag = 'b' THEN n_exact END) AS nb,
                         max(CASE WHEN tag = 'u' THEN n_exact END) AS nu
                       FROM e2)
         SELECT na, nb, nu, na + nb - nu AS exact_intersect,
                CAST(floor((ea + eb - eu) * 10000) AS DOUBLE) / 10000
                  AS est_intersect
         FROM wide""",
    "agg_kmv_distinct" ->
      """WITH h AS (SELECT DISTINCT o_orderpriority AS prio, o_custkey
                    FROM orders),
              hu AS (SELECT prio, o_custkey,
                            list_aggregate(list_transform(range(1, 13),
                              j -> (strpos('0123456789abcdef',
                                     substr(md5(CAST(o_custkey AS VARCHAR)),
                                            CAST(j AS INT), 1)) - 1)
                                   * pow(16, 12 - j)), 'sum')
                              / 281474976710656.0 AS u
                     FROM h),
              rk AS (SELECT prio, o_custkey, u,
                            row_number() OVER (PARTITION BY prio
                              ORDER BY u, o_custkey) AS rn
                     FROM hu),
              g AS (SELECT prio, count(*) AS n_exact,
                           max(CASE WHEN rn = 64 THEN u END) AS uk
                    FROM rk GROUP BY prio)
         SELECT prio, n_exact,
                CAST(floor((CASE WHEN n_exact < 64
                             THEN CAST(n_exact AS DOUBLE)
                             ELSE 63.0 / uk END) * 10000) AS DOUBLE)
                  / 10000 AS est,
                CAST(floor(((CASE WHEN n_exact < 64
                              THEN CAST(n_exact AS DOUBLE)
                              ELSE 63.0 / uk END)
                            - n_exact) / n_exact * 10000) AS DOUBLE)
                  / 10000 AS rel_err
         FROM g ORDER BY prio""",
    "agg_bloom_membership" ->
      """WITH existing AS (SELECT md5(text) AS h FROM documents
                           WHERE doc_id % 3 <> 0),
              batch AS (SELECT doc_id, md5(text) AS h FROM documents
                        WHERE doc_id % 3 = 0),
              ks AS (SELECT unnest(range(0, 4)) AS k),
              bits AS (SELECT DISTINCT
                         (strpos(a, substr(hh, 1, 1)) - 1) * 256
                         + (strpos(a, substr(hh, 2, 1)) - 1) * 16
                         + (strpos(a, substr(hh, 3, 1)) - 1) AS bit
                       FROM (SELECT md5(CAST(ks.k AS VARCHAR) || ':' || e.h)
                                      AS hh,
                                    '0123456789abcdef' AS a
                             FROM existing e, ks)),
              probe AS (SELECT doc_id, h,
                               (strpos(a, substr(hh, 1, 1)) - 1) * 256
                               + (strpos(a, substr(hh, 2, 1)) - 1) * 16
                               + (strpos(a, substr(hh, 3, 1)) - 1) AS bit
                        FROM (SELECT b.doc_id, b.h,
                                     md5(CAST(ks.k AS VARCHAR) || ':' || b.h)
                                       AS hh,
                                     '0123456789abcdef' AS a
                              FROM batch b, ks)),
              verd AS (SELECT p.doc_id, p.h,
                              count(CASE WHEN bits.bit IS NOT NULL
                                    THEN 1 END) = 4 AS maybe_dup
                       FROM probe p LEFT JOIN bits ON bits.bit = p.bit
                       GROUP BY p.doc_id, p.h),
              truth AS (SELECT DISTINCT h FROM existing)
         SELECT maybe_dup, count(*) AS n_batch,
                count(CASE WHEN truth.h IS NOT NULL THEN 1 END)
                  AS n_truly_dup
         FROM verd LEFT JOIN truth ON truth.h = verd.h
         GROUP BY maybe_dup ORDER BY maybe_dup""",
    "analytics_attribution_last_touch" ->
      """WITH e AS (SELECT user_id, event_type, event_id,
                           epoch_us(ts) AS us
                    FROM events),
              p AS (SELECT user_id, event_id AS pid, us AS pus
                    FROM e WHERE event_type = 'purchase'),
              c AS (SELECT p.pid, e.event_type,
                           row_number() OVER (PARTITION BY p.pid
                             ORDER BY e.us DESC, e.event_id DESC) AS rn
                    FROM p JOIN e ON e.user_id = p.user_id
                     AND e.event_type IN ('view', 'click')
                     AND e.us >= p.pus - 604800000000
                     AND e.us <= p.pus - 1),
              a AS (SELECT p.pid, coalesce(c.event_type, 'none') AS channel
                    FROM p LEFT JOIN c ON c.pid = p.pid AND c.rn = 1)
         SELECT channel, count(*) AS n_purchases
         FROM a GROUP BY channel ORDER BY channel""",
    "agg_countmin_heavy" ->
      """WITH rs AS (SELECT unnest(range(0, 4)) AS r),
              hashed AS (
                SELECT rs.r AS r,
                       md5(CAST(rs.r AS VARCHAR) || ':'
                           || CAST(e.user_id AS VARCHAR)) AS h,
                       ((strpos('0123456789abcdef', substr(h, 1, 1)) - 1) * 16
                        + (strpos('0123456789abcdef', substr(h, 2, 1)) - 1))
                         % 64 AS b
                FROM events e, rs),
              cnt AS (SELECT r, b, count(*) AS c
                      FROM hashed GROUP BY r, b),
              probes AS (SELECT user_id, count(*) AS n_exact
                         FROM events WHERE user_id % 100 = 0
                         GROUP BY user_id),
              pb AS (SELECT p.user_id, p.n_exact, rs.r AS r,
                            md5(CAST(rs.r AS VARCHAR) || ':'
                                || CAST(p.user_id AS VARCHAR)) AS h,
                            ((strpos('0123456789abcdef', substr(h, 1, 1)) - 1)
                               * 16
                             + (strpos('0123456789abcdef',
                                       substr(h, 2, 1)) - 1)) % 64 AS b
                     FROM probes p, rs)
         SELECT pb.user_id, pb.n_exact,
                CAST(min(cnt.c) AS BIGINT) AS n_est,
                CAST(min(cnt.c) - pb.n_exact AS BIGINT) AS overcount
         FROM pb JOIN cnt ON cnt.r = pb.r AND cnt.b = pb.b
         GROUP BY pb.user_id, pb.n_exact
         ORDER BY pb.user_id""",
    "timeseries_median_ma" ->
      """WITH hourly AS (
           SELECT event_type, date_trunc('hour', ts) AS h,
                  CAST(floor(CAST(sum(CAST(value AS DECIMAL(18,2)))
                               AS DOUBLE) / count(*) * 10000) AS BIGINT)
                    AS hv4i
           FROM events GROUP BY 1, 2),
         t AS (
           SELECT event_type, h,
                  list(hv4i) OVER (PARTITION BY event_type ORDER BY h
                    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS ls
           FROM hourly)
         SELECT event_type, h,
                CAST(list_sort(ls)[4] AS DOUBLE) / 10000 AS med4
         FROM t WHERE len(ls) = 7 ORDER BY event_type, h""",
    "timeseries_trend_ma" ->
      """WITH hourly AS (
           SELECT event_type, date_trunc('hour', ts) AS h,
                  CAST(floor(CAST(sum(CAST(value AS DECIMAL(18,2)))
                               AS DOUBLE) / count(*) * 10000) AS BIGINT)
                    AS hv4i
           FROM events GROUP BY 1, 2),
         t AS (
           SELECT event_type, h, hv4i,
                  count(*) OVER w AS n_window,
                  CAST(sum(hv4i) OVER w AS BIGINT) AS si
           FROM hourly
           WINDOW w AS (PARTITION BY event_type ORDER BY h
                        ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING))
         SELECT event_type, h,
                CAST(hv4i AS DOUBLE) / 10000 AS hv4,
                CAST(floor(CAST(si AS DOUBLE) / (n_window * 10000.0)
                           * 10000) AS DOUBLE) / 10000 AS trend4
         FROM t WHERE n_window = 7 ORDER BY event_type, h""",
    "timeseries_interpolate_linear" ->
      """WITH hourly AS (
           SELECT event_type, date_trunc('hour', ts) AS h,
                  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
                    / count(*) AS v
           FROM events GROUP BY 1, 2),
         spans AS (
           SELECT event_type, min(h) AS h0, max(h) AS h1
           FROM hourly GROUP BY event_type),
         grid AS (
           SELECT event_type,
                  unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
           FROM spans),
         g AS (
           SELECT grid.event_type, grid.h, epoch_us(grid.h) AS us, hourly.v
           FROM grid LEFT JOIN hourly
             ON grid.event_type = hourly.event_type AND grid.h = hourly.h),
         f AS (
           SELECT event_type, h, us, v,
                  last_value(v IGNORE NULLS) OVER wb AS pv,
                  last_value(CASE WHEN v IS NOT NULL THEN us END
                             IGNORE NULLS) OVER wb AS pu,
                  first_value(v IGNORE NULLS) OVER wf AS nv,
                  first_value(CASE WHEN v IS NOT NULL THEN us END
                              IGNORE NULLS) OVER wf AS nu
           FROM g
           WINDOW wb AS (PARTITION BY event_type ORDER BY us
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                  wf AS (PARTITION BY event_type ORDER BY us
                         ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
         SELECT event_type, h, v IS NOT NULL AS observed,
                CAST(floor((CASE WHEN v IS NOT NULL THEN v
                      ELSE pv + (nv - pv)
                           * (CAST(us - pu AS DOUBLE)
                              / CAST(nu - pu AS DOUBLE)) END) * 10000)
                     AS DOUBLE) / 10000 AS v_interp
         FROM f ORDER BY event_type, h""",
    "timeseries_ewma" ->
      """WITH e AS (SELECT event_id, event_type, value,
                           epoch_us(ts) AS us
                    FROM events),
              fr AS (SELECT event_id, event_type, value,
                            list(value) OVER (PARTITION BY event_type
                              ORDER BY us, event_id
                              ROWS BETWEEN 7 PRECEDING AND CURRENT ROW)
                              AS ls
                     FROM e)
         SELECT event_id, event_type, value,
                CAST(floor(
                  list_aggregate(list_transform(range(1, len(ls) + 1),
                    p -> ls[p] * pow(0.5, len(ls) - p)), 'sum')
                  / list_aggregate(list_transform(range(1, len(ls) + 1),
                    p -> pow(0.5, len(ls) - p)), 'sum')
                  * 10000) AS DOUBLE) / 10000 AS ewma8
         FROM fr WHERE event_id % 101 = 0 ORDER BY event_id""",
    "timeseries_ohlc" ->
      """WITH e AS (SELECT event_type, value, event_id,
                           epoch_us(ts) AS us, date_trunc('hour', ts) AS h
                    FROM events)
         SELECT event_type, h,
                arg_min(value, printf('%020d|%012d', us, event_id)) AS open,
                max(value) AS high,
                min(value) AS low,
                arg_max(value, printf('%020d|%012d', us, event_id)) AS close,
                count(*) AS n
         FROM e GROUP BY event_type, h ORDER BY event_type, h""",
    "anomaly_mad" ->
      """WITH med AS (SELECT event_type, quantile_cont(value, 0.5) AS m
                      FROM events GROUP BY event_type),
              dev AS (SELECT e.event_type, abs(value - m) AS dv
                      FROM events e JOIN med USING (event_type)),
              mad AS (SELECT event_type, quantile_cont(dv, 0.5) AS mad
                      FROM dev GROUP BY event_type)
         SELECT d.event_type, count(*) AS n,
                count(CASE WHEN dv > 3 * 1.4826 * mad THEN 1 END)
                  AS n_outliers,
                floor(max(mad) * 10000) / 10000 AS mad4
         FROM dev d JOIN mad USING (event_type)
         GROUP BY d.event_type ORDER BY d.event_type""",
    "analytics_rfm" ->
      """WITH cust AS (
           SELECT o_custkey,
                  date_diff('day', max(CAST(o_orderdate AS DATE)),
                    (SELECT max(CAST(o_orderdate AS DATE)) FROM orders))
                    AS rec,
                  count(*) AS freq,
                  sum(CAST(o_totalprice AS DECIMAL(18,2))) AS mon
           FROM orders GROUP BY o_custkey),
         b AS (SELECT o_custkey, mon,
                      ntile(5) OVER (ORDER BY rec ASC, o_custkey) AS r,
                      ntile(5) OVER (ORDER BY freq DESC, o_custkey) AS f,
                      ntile(5) OVER (ORDER BY mon DESC, o_custkey) AS m
               FROM cust)
         SELECT r, f, m, count(*) AS n_customers,
                floor(CAST(sum(mon) AS DOUBLE) / count(*) * 10000) / 10000
                  AS avg_monetary
         FROM b GROUP BY r, f, m ORDER BY r, f, m""",
    "agg_entropy" ->
      """WITH c AS (SELECT user_id % 16 AS bucket, event_type,
                           count(*) AS n
                    FROM events GROUP BY 1, 2),
              t AS (SELECT bucket, sum(n) AS tot FROM c GROUP BY bucket)
         SELECT c.bucket, CAST(sum(n) AS BIGINT) AS n_events,
                CAST(floor(-sum(CAST((CAST(n AS DOUBLE) / tot)
                    * ln(CAST(n AS DOUBLE) / tot) AS DECIMAL(28,10)))
                  * 10000) AS DOUBLE) / 10000 AS entropy
         FROM c JOIN t USING (bucket)
         GROUP BY c.bucket ORDER BY c.bucket""",
  )
}
