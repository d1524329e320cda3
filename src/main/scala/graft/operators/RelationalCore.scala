package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** M0 relational slice (SURVEY.md §7.2): scan → filter → project →
  * join → agg → sort → limit, each as a declared, DuckDB-oracle-checked
  * query.
  *
  * Determinism rules (SURVEY §5.4) applied to every query here:
  *   - ends in a total ORDER BY (unique key set, or the full output
  *     column list so tied rows are bit-identical),
  *   - every double aggregate wrapped in round(x, 4) on BOTH sides,
  *   - aliases identical between the Spark plan and the oracle SQL.
  *
  * Scale notes: all operators below are shuffle-bounded — filters and
  * projections push into the parquet scan; the group-bys are
  * partial-aggregated map-side before the exchange; the dimension join
  * broadcasts only `nation`/`region` (constant-size); top-k compiles
  * to TakeOrderedAndProject (per-partition heap + driver merge of k
  * rows), never a global sort.
  */
object RelationalCore {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // Full-table scan; count comes from parquet footers + scan.
    "scan_parquet" -> ((s, d) =>
      Tables.lineitem(s, d).agg(count(lit(1)).as("n_rows"))),

    // 2 of 11 lineitem columns: ReadSchema in the plan must contain
    // only these two (asserted in PlanShapeSpec). Output is a bounded
    // per-bucket fingerprint — the pruning is the point, and the plan
    // stays scale-safe (no global sort, no full-table dump) at any SF.
    "scan_projection_pushdown" -> ((s, d) =>
      Tables.lineitem(s, d)
        .select("l_orderkey", "l_quantity")
        .groupBy((col("l_orderkey") % 1000).as("bucket"))
        .agg(
          count(lit(1)).as("n"),
          round(sum(col("l_quantity")), 4).as("sum_qty"),
          min(col("l_orderkey")).as("min_ok"),
          max(col("l_orderkey")).as("max_ok"))
        .orderBy("bucket")),

    // The core staging normalize: select + rename + cast.
    // (l_quantity is integral-valued, so Spark's truncating cast and
    // DuckDB's rounding cast agree — do NOT copy this pattern for
    // fractional doubles.) Output is a bounded per-flag fingerprint of
    // the renamed/cast columns — scale-safe at any SF.
    "project_rename_cast" -> ((s, d) =>
      Tables.lineitem(s, d)
        .select(
          col("l_orderkey").as("ok"),
          col("l_linenumber").as("ln"),
          col("l_quantity").cast("long").as("qty"),
          upper(col("l_returnflag")).as("rf"))
        .groupBy("rf")
        .agg(
          count(lit(1)).as("n"),
          sum(col("qty")).as("sum_qty"),
          min(col("ln")).as("min_ln"),
          max(col("ln")).as("max_ln"),
          max(col("ok")).as("max_ok"))
        .orderBy("rf")),

    "filter_comparison" -> ((s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_quantity") > 45 && col("l_discount") <= 0.02)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_discount")
        .orderBy("l_orderkey", "l_linenumber", "l_quantity", "l_discount")),

    // Flagship: TPC-H Q1 shape over lineitem.
    // Large sums go through DECIMAL (exact, order-independent): the
    // source data is 2-decimal prices, and products of 2-decimal
    // factors are exactly 4/6-decimal, so the decimal cast recovers
    // the exact value and the sum is bit-identical in any engine and
    // any partitioning — round(sum(double),4) is NOT at 1e10 magnitude
    // (SURVEY §5.4.2, verified failing at sf0.1 without this).
    "agg_pricing_summary" -> ((s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity").cast("decimal(18,2)")).cast("double"), 4)
            .as("sum_qty"),
          round(sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double"), 4)
            .as("sum_base_price"),
          round(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .cast("decimal(18,4)")).cast("double"), 4).as("sum_disc_price"),
          round(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount"))
            * (lit(1.0) + col("l_tax"))).cast("decimal(18,6)")).cast("double"), 4)
            .as("sum_charge"),
          round(avg(col("l_quantity")), 4).as("avg_qty"),
          round(avg(col("l_extendedprice")), 4).as("avg_price"),
          round(avg(col("l_discount")), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")),

    // Star-schema dimension join: supplier ⋈ nation ⋈ region with the
    // two dims broadcast (constant size at any SF — never shuffles the
    // fact side).
    "join_broadcast_dim" -> ((s, d) =>
      Tables.supplier(s, d)
        .join(broadcast(Tables.nation(s, d)),
          col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d)),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(
          count(lit(1)).as("n_suppliers"),
          round(sum(col("s_acctbal").cast("decimal(18,2)")).cast("double"), 4)
            .as("total_bal"))
        .orderBy("r_name")),

    // Top-k: physical plan is TakeOrderedAndProject — per-partition
    // heap of k, driver merges k·partitions rows; no global sort.
    "topk_order_limit" -> ((s, d) =>
      Tables.orders(s, d)
        .select("o_orderkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(10)),
  )

  val oracles: Map[String, String] = Map(
    "scan_parquet" ->
      "SELECT count(*) AS n_rows FROM lineitem",
    "scan_projection_pushdown" ->
      """SELECT l_orderkey % 1000 AS bucket, count(*) AS n,
                round(sum(l_quantity), 4) AS sum_qty,
                min(l_orderkey) AS min_ok, max(l_orderkey) AS max_ok
         FROM lineitem GROUP BY 1 ORDER BY bucket""",
    "project_rename_cast" ->
      """SELECT upper(l_returnflag) AS rf, count(*) AS n,
                CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
                min(l_linenumber) AS min_ln, max(l_linenumber) AS max_ln,
                max(l_orderkey) AS max_ok
         FROM lineitem GROUP BY 1 ORDER BY rf""",
    "filter_comparison" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_discount
         FROM lineitem WHERE l_quantity > 45 AND l_discount <= 0.02
         ORDER BY l_orderkey, l_linenumber, l_quantity, l_discount""",
    "agg_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
                round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 4)
                  AS sum_qty,
                round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 4)
                  AS sum_base_price,
                round(CAST(sum(CAST(l_extendedprice * (1.0 - l_discount)
                      AS DECIMAL(18,4))) AS DOUBLE), 4) AS sum_disc_price,
                round(CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)
                      AS DECIMAL(18,6))) AS DOUBLE), 4) AS sum_charge,
                round(avg(l_quantity), 4)      AS avg_qty,
                round(avg(l_extendedprice), 4) AS avg_price,
                round(avg(l_discount), 4)      AS avg_disc,
                count(*) AS count_order
         FROM lineitem
         WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
         GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""",
    "join_broadcast_dim" ->
      """SELECT r_name, count(*) AS n_suppliers,
                round(CAST(sum(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE), 4)
                  AS total_bal
         FROM supplier
         JOIN nation ON s_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY r_name ORDER BY r_name""",
    "topk_order_limit" ->
      """SELECT o_orderkey, o_totalprice FROM orders
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""",
  )
}
