package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Predicate / derived-column / sort operators (SURVEY.md §2.2, §2.6).
  *
  * The fixtures contain no NULLs, so null-handling queries synthesize
  * them deterministically with nullif — the null-path semantics
  * (three-valued logic, null-safe equality, NULLS FIRST placement) are
  * still fully exercised.
  *
  * Scale notes: all predicates are Catalyst-pushable (they reach the
  * parquet scan as PushedFilters — asserted in PlanShapeSpec);
  * sort_multi_key is bounded by LIMIT so it compiles to
  * TakeOrderedAndProject (per-partition heap), never a global sort.
  */
object FiltersDerive {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // IN + BETWEEN + LIKE in one pushable conjunction.
    "filter_in_between_like" -> ((s, d) =>
      Tables.part(s, d)
        .filter(col("p_type").isin("ECONOMY", "PROMO") &&
          col("p_size").between(10, 40) &&
          col("p_name").like("%red%"))
        .select("p_partkey", "p_name", "p_type", "p_size")
        .orderBy("p_partkey")),

    // isNull / isNotNull / null-safe equality (<=>) over a
    // deterministically synthesized nullable column.
    "filter_null_handling" -> ((s, d) =>
      Tables.orders(s, d)
        .withColumn("st", expr("nullif(o_orderstatus, 'P')"))
        .agg(
          count(when(col("st").isNull, 1)).as("n_null"),
          count(when(col("st").isNotNull, 1)).as("n_notnull"),
          count(when(col("st") <=> "F", 1)).as("n_f_nullsafe"),
          count(when(col("st") <=> lit(null).cast("string"), 1)).as("n_null_nullsafe"))),

    // CASE WHEN tiering + per-tier rollup.
    "derive_conditional" -> ((s, d) =>
      Tables.orders(s, d)
        .withColumn("tier",
          when(col("o_totalprice") > 400000, "high")
            .when(col("o_totalprice") > 200000, "mid")
            .otherwise("low"))
        .groupBy("tier")
        .agg(
          count(lit(1)).as("n_orders"),
          round(sum(col("o_totalprice")), 4).as("total"))
        .orderBy("tier")),

    // Mixed-direction multi-key sort with NULLS FIRST + unique
    // tiebreak, bounded by LIMIT → TakeOrderedAndProject.
    "sort_multi_key" -> ((s, d) =>
      Tables.orders(s, d)
        .select(col("o_orderkey"),
          expr("nullif(o_orderstatus, 'P')").as("st"),
          col("o_totalprice"))
        .orderBy(col("st").asc_nulls_first, col("o_totalprice").desc,
          col("o_orderkey"))
        .limit(500)),
  )

  val oracles: Map[String, String] = Map(
    "filter_in_between_like" ->
      """SELECT p_partkey, p_name, p_type, p_size FROM part
         WHERE p_type IN ('ECONOMY', 'PROMO')
           AND p_size BETWEEN 10 AND 40
           AND p_name LIKE '%red%'
         ORDER BY p_partkey""",
    "filter_null_handling" ->
      """SELECT count(*) FILTER (st IS NULL) AS n_null,
                count(*) FILTER (st IS NOT NULL) AS n_notnull,
                count(*) FILTER (st IS NOT DISTINCT FROM 'F') AS n_f_nullsafe,
                count(*) FILTER (st IS NOT DISTINCT FROM NULL) AS n_null_nullsafe
         FROM (SELECT nullif(o_orderstatus, 'P') AS st FROM orders)""",
    "derive_conditional" ->
      """SELECT CASE WHEN o_totalprice > 400000 THEN 'high'
                     WHEN o_totalprice > 200000 THEN 'mid'
                     ELSE 'low' END AS tier,
                count(*) AS n_orders,
                round(sum(o_totalprice), 4) AS total
         FROM orders GROUP BY tier ORDER BY tier""",
    "sort_multi_key" ->
      """SELECT o_orderkey, nullif(o_orderstatus, 'P') AS st, o_totalprice
         FROM orders
         ORDER BY st ASC NULLS FIRST, o_totalprice DESC, o_orderkey
         LIMIT 500""",
  )
}
