package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Feature-engineering operators (SURVEY.md §2.11, round 7) — the
  * tabular-feature prep stage of a training-data pipeline (scaling,
  * encoding), built as the two-pass stats-then-broadcast shapes that
  * survive 100 TB.
  *
  * Determinism (SURVEY §5.4): every mean/variance that feeds a
  * division is computed from exact DECIMAL sums (c_acctbal /
  * o_totalprice carry 2 decimal digits, so DECIMAL(18,2) and the
  * (18,4) square are exact), then converted to double with an
  * identical arithmetic order in both engines; outputs are
  * round(…, 4–6) with orders of magnitude of margin.
  */
object Features {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // Hashed feature crosses (r12) — the wide-and-deep featurizer
    // (Cheng et al. 2016): user × event_type crossed into a FIXED
    // 4096-bucket space via the engine's md5 coin (12 hex bits), so
    // the feature dimensionality is a constant however many ids the
    // corpus has — the property that makes crosses servable at
    // 100 TB. The declared output is the bucket-OCCUPANCY histogram
    // (how many buckets carry 1, 2, … distinct crosses): the
    // collision census you read before trusting a hashed cross —
    // too-hot buckets mean the space is too small for the
    // cardinality. Crosses are distinct-deduped FIRST (group-grain),
    // so the histogram is over the cross vocabulary, not event
    // traffic; everything after the distinct is synopsis-grain.
    "feature_hash_cross" -> ((s, d) => {
      Tables.events(s, d)
        .select(col("user_id"), col("event_type")).distinct()
        .withColumn("bucket", expr(
          """CAST(conv(substring(md5(concat(CAST(user_id AS STRING), 'x',
               event_type)), 1, 3), 16, 10) AS BIGINT) % 4096"""))
        .groupBy("bucket").agg(count(lit(1)).as("load"))
        .groupBy("load").agg(count(lit(1)).as("n_buckets"))
        .orderBy("load")
    }),
    // Min-max + z-score scaling of c_acctbal per market segment — the
    // canonical two-pass scaler: pass 1 is a 5-row stats aggregate
    // (min/max exact; mean/var from exact decimal sums so the result
    // is independent of partial-agg merge order), pass 2 re-reads the
    // table and BROADCASTS the stats row back on the segment key. At
    // 100 TB the stats side stays bytes-sized no matter the table —
    // no window over the full table, no second shuffle of data rows.
    "feature_scale_standardize" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val stats = c.groupBy(col("c_mktsegment").as("seg"))
        .agg(min("c_acctbal").as("lo"), max("c_acctbal").as("hi"),
          sum(col("c_acctbal").cast("decimal(18,2)")).as("s1"),
          sum((col("c_acctbal") * col("c_acctbal"))
            .cast("decimal(24,4)")).as("s2"),
          count(lit(1)).as("n"))
        .select(col("seg"), col("lo"), col("hi"), col("n"),
          (col("s1").cast("double") / col("n")).as("mu"),
          sqrt((col("s2").cast("double")
            - col("s1").cast("double") * col("s1").cast("double") / col("n"))
            / (col("n") - 1)).as("sd"))
      c.filter(col("c_custkey") % 97 === 0)
        .join(broadcast(stats), col("c_mktsegment") === col("seg"))
        .select(col("c_custkey"), col("c_mktsegment"),
          round((col("c_acctbal") - col("lo")) / (col("hi") - col("lo")), 6)
            .as("minmax"),
          round((col("c_acctbal") - col("mu")) / col("sd"), 4).as("zscore"))
        .orderBy("c_custkey")
    }),

    // Row-level one-hot encoding of the segment categorical into a
    // fixed indicator vector (the inference-time contract: column set
    // is FIXED by the vocabulary, never data-dependent). Pure
    // projection — no shuffle at all except the output sample's sort;
    // at 100 TB this fuses into whatever scan feeds the trainer.
    "feature_onehot_encode" -> ((s, d) => {
      val segs = Seq("AUTOMOBILE", "BUILDING", "FURNITURE",
        "HOUSEHOLD", "MACHINERY")
      val c = Tables.customer(s, d).filter(col("c_custkey") % 199 === 0)
      segs.foldLeft(c) { (df, v) =>
        df.withColumn(s"seg_${v.toLowerCase}",
          when(col("c_mktsegment") === v, 1L).otherwise(0L))
      }.select(col("c_custkey") +: col("c_mktsegment") +:
          segs.map(v => col(s"seg_${v.toLowerCase}")): _*)
        .orderBy("c_custkey")
    }),

    // Smoothed (m-estimate) target encoding: category → blend of the
    // category's target mean and the global prior, enc =
    // (sum + m·prior) / (n + m), m = 50. The leakage-safe fit is a
    // per-category aggregate (5 rows) plus ONE global scalar — both
    // exact decimal sums; the 1-row prior rides a broadcast nested
    // loop (a true scalar, not a data-sized cross). The customer⋈
    // orders join is the only data shuffle.
    "feature_target_encode" -> ((s, d) => {
      val j = Tables.orders(s, d)
        .join(Tables.customer(s, d)
          .select("c_custkey", "c_mktsegment"),
          col("o_custkey") === col("c_custkey"))
      val per = j.groupBy(col("c_mktsegment").as("seg"))
        .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("s"),
          count(lit(1)).as("n"))
      val prior = j.agg(
        (sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
          / count(lit(1))).as("prior"))
      per.crossJoin(broadcast(prior))
        .select(col("seg"), col("n"),
          round(col("s").cast("double") / col("n"), 4).as("raw_mean"),
          round((col("s").cast("double") + lit(50.0) * col("prior"))
            / (col("n") + 50), 4).as("smoothed"))
        .orderBy("seg")
    }),

    // Weight-of-evidence encoding (r9) — the credit-scoring-standard
    // categorical encoder beside the smoothed target encoder above:
    // WoE_c = ln( ((pos_c + 0.5)/pos_tot) / ((neg_c + 0.5)/neg_tot) )
    // (0.5 = the Yates/Laplace half-count that keeps empty cells
    // finite), plus the information value IV = Σ (p_c − q_c)·WoE_c —
    // the feature-screening statistic (IV < 0.02 = drop the column).
    // Binary target: order status F (fulfilled) vs rest. Same scale
    // shape as target_encode: one bounded per-category aggregate +
    // one 1-row broadcast; IV terms DECIMAL(28,10) pre-sum.
    "feature_woe_encode" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val o = Tables.orders(s, d)
        .select(col("o_orderpriority").as("cat"),
          when(col("o_orderstatus") === "F", 1L).otherwise(0L).as("y"))
      val per = o.groupBy("cat")
        .agg(count(lit(1)).as("n"), sum(col("y")).as("pos"))
        .withColumn("neg", col("n") - col("pos"))
      val tot = per.agg(sum(col("pos")).as("post"),
        sum(col("neg")).as("negt"))
      val wAll = Window.partitionBy(lit(1))
      per.crossJoin(broadcast(tot))
        .withColumn("woe", expr(
          """ln(((CAST(pos AS DOUBLE) + 0.5) / CAST(post AS DOUBLE))
                / ((CAST(neg AS DOUBLE) + 0.5) / CAST(negt AS DOUBLE)))"""))
        .withColumn("ivt",
          ((col("pos").cast("double") / col("post").cast("double")
            - col("neg").cast("double") / col("negt").cast("double"))
            * col("woe")).cast("decimal(28,10)"))
        .select(col("cat"), col("n"), col("pos"),
          (floor(col("woe") * 10000.0) / 10000).as("woe"),
          (floor(sum(col("ivt")).over(wAll).cast("double") * 10000.0)
            / 10000).as("iv_total"))
        .orderBy("cat")
    }),

    // End-to-end feature-prep funnel (r7): join label + categoricals
    // → two-pass scaling → one-hot → smoothed target encode → group
    // holdout split, landing the training-table fingerprint per
    // (split, segment). One pass over orders, one broadcast stats
    // row, one broadcast encoder table — the complete tabular-prep
    // DAG as a single declared plan (integration, not a new
    // primitive: each stage is its own oracled key above).
    "pipeline_feature_e2e" -> ((s, d) => {
      val j = Tables.orders(s, d)
        .join(Tables.customer(s, d)
          .select("c_custkey", "c_mktsegment", "c_acctbal"),
          col("o_custkey") === col("c_custkey"))
      val stats = j.groupBy(col("c_mktsegment").as("seg"))
        .agg(min("o_totalprice").as("lo"), max("o_totalprice").as("hi"),
          sum(col("o_totalprice").cast("decimal(18,2)")).as("ts1"),
          count(lit(1)).as("tn"))
        .select(col("seg"), col("lo"), col("hi"),
          (col("ts1").cast("double") / col("tn")).as("enc_raw"))
      j.join(broadcast(stats), col("c_mktsegment") === col("seg"))
        .withColumn("price_minmax",
          (col("o_totalprice") - col("lo")) / (col("hi") - col("lo")))
        .withColumn("is_building",
          when(col("c_mktsegment") === "BUILDING", 1L).otherwise(0L))
        .withColumn("split",
          when(substring(md5(col("o_custkey").cast("string")), 1, 1) < "c",
            lit("train")).otherwise(lit("holdout")))
        .groupBy("split", "c_mktsegment")
        .agg(count(lit(1)).as("n"),
          round(sum(col("price_minmax").cast("decimal(18,12)"))
            .cast("double"), 4).as("minmax_sum"),
          sum(col("is_building")).cast("bigint").as("onehot_sum"),
          round(max(col("enc_raw")), 4).as("target_enc"))
        .orderBy("split", "c_mktsegment")
    }),
  )

  val oracles: Map[String, String] = Map(
    "feature_hash_cross" ->
      """WITH crosses AS (SELECT DISTINCT user_id, event_type
                          FROM events),
              b AS (SELECT ((strpos(a, substr(hh, 1, 1)) - 1) * 256
                            + (strpos(a, substr(hh, 2, 1)) - 1) * 16
                            + (strpos(a, substr(hh, 3, 1)) - 1)) % 4096
                             AS bucket
                    FROM (SELECT md5(CAST(user_id AS VARCHAR) || 'x'
                                     || event_type) AS hh,
                                 '0123456789abcdef' AS a
                          FROM crosses)),
              l AS (SELECT bucket, count(*) AS load FROM b
                    GROUP BY bucket)
         SELECT CAST(load AS BIGINT) AS load, count(*) AS n_buckets
         FROM l GROUP BY load ORDER BY load""",
    "feature_woe_encode" ->
      """WITH o AS (SELECT o_orderpriority AS cat,
                           CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0
                           END AS y
                    FROM orders),
              per AS (SELECT cat, count(*) AS n,
                             CAST(sum(y) AS BIGINT) AS pos,
                             CAST(count(*) - sum(y) AS BIGINT) AS neg
                      FROM o GROUP BY cat),
              tot AS (SELECT CAST(sum(pos) AS BIGINT) AS post,
                             CAST(sum(neg) AS BIGINT) AS negt
                      FROM per),
              w AS (SELECT cat, n, pos, neg, post, negt,
                           ln(((CAST(pos AS DOUBLE) + 0.5)
                                / CAST(post AS DOUBLE))
                              / ((CAST(neg AS DOUBLE) + 0.5)
                                 / CAST(negt AS DOUBLE))) AS woe
                    FROM per CROSS JOIN tot),
              v AS (SELECT *,
                           CAST((CAST(pos AS DOUBLE) / CAST(post AS DOUBLE)
                                 - CAST(neg AS DOUBLE)
                                   / CAST(negt AS DOUBLE)) * woe
                             AS DECIMAL(28,10)) AS ivt
                    FROM w)
         SELECT cat, n, pos,
                floor(woe * 10000.0) / 10000 AS woe,
                floor(CAST(sum(ivt) OVER () AS DOUBLE) * 10000.0) / 10000
                  AS iv_total
         FROM v ORDER BY cat""",
    "feature_scale_standardize" ->
      """WITH stats AS (
           SELECT c_mktsegment AS seg,
                  min(c_acctbal) AS lo, max(c_acctbal) AS hi,
                  count(*) AS n,
                  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                    AS s1d,
                  CAST(sum(CAST(c_acctbal * c_acctbal AS DECIMAL(24,4)))
                    AS DOUBLE) AS s2d
           FROM customer GROUP BY 1)
         SELECT c_custkey, c_mktsegment,
                round((c_acctbal - lo) / (hi - lo), 6) AS minmax,
                round((c_acctbal - s1d / n)
                      / sqrt((s2d - s1d * s1d / n) / (n - 1)), 4)
                  AS zscore
         FROM customer JOIN stats ON c_mktsegment = seg
         WHERE c_custkey % 97 = 0 ORDER BY c_custkey""",
    "feature_onehot_encode" ->
      """SELECT c_custkey, c_mktsegment,
                CAST(c_mktsegment = 'AUTOMOBILE' AS BIGINT) AS seg_automobile,
                CAST(c_mktsegment = 'BUILDING'   AS BIGINT) AS seg_building,
                CAST(c_mktsegment = 'FURNITURE'  AS BIGINT) AS seg_furniture,
                CAST(c_mktsegment = 'HOUSEHOLD'  AS BIGINT) AS seg_household,
                CAST(c_mktsegment = 'MACHINERY'  AS BIGINT) AS seg_machinery
         FROM customer WHERE c_custkey % 199 = 0 ORDER BY c_custkey""",
    "pipeline_feature_e2e" ->
      """WITH j AS (SELECT o_custkey, o_totalprice, c_mktsegment
                    FROM orders JOIN customer ON o_custkey = c_custkey),
              st AS (SELECT c_mktsegment AS seg,
                            min(o_totalprice) AS lo,
                            max(o_totalprice) AS hi,
                            CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                              AS DOUBLE) / count(*) AS enc_raw
                     FROM j GROUP BY 1),
              f AS (SELECT c_mktsegment,
                           (o_totalprice - lo) / (hi - lo) AS price_minmax,
                           CASE WHEN c_mktsegment = 'BUILDING'
                                THEN 1 ELSE 0 END AS is_building,
                           CASE WHEN substr(md5(CAST(o_custkey AS VARCHAR)),
                                  1, 1) < 'c'
                                THEN 'train' ELSE 'holdout' END AS split,
                           enc_raw
                    FROM j JOIN st ON c_mktsegment = seg)
         SELECT split, c_mktsegment, count(*) AS n,
                round(CAST(sum(CAST(price_minmax AS DECIMAL(18,12)))
                  AS DOUBLE), 4) AS minmax_sum,
                CAST(sum(is_building) AS BIGINT) AS onehot_sum,
                round(max(enc_raw), 4) AS target_enc
         FROM f GROUP BY split, c_mktsegment
         ORDER BY split, c_mktsegment""",
    "feature_target_encode" ->
      """WITH j AS (SELECT c_mktsegment, o_totalprice
                    FROM orders JOIN customer ON o_custkey = c_custkey),
              per AS (SELECT c_mktsegment AS seg,
                             sum(CAST(o_totalprice AS DECIMAL(18,2))) AS s,
                             count(*) AS n
                      FROM j GROUP BY 1),
              pri AS (SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                               AS DOUBLE) / count(*) AS prior FROM j)
         SELECT seg, n,
                round(CAST(s AS DOUBLE) / n, 4) AS raw_mean,
                round((CAST(s AS DOUBLE) + 50.0 * prior) / (n + 50), 4)
                  AS smoothed
         FROM per, pri ORDER BY seg""",
  )
}
