package graft

import org.apache.spark.sql.functions._
import graft.operators.ScaleJoins

/** Plan + semantics tests for the scale-technique joins. */
class ScaleJoinsSpec extends GraftSuite {

  test("join_skew_salted equals the plain unsalted join") {
    val salted = ScaleJoins.queries("join_skew_salted")(spark, sf)
    val plain = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_items"),
        // same decimal-exact formulation as the operator — a plain
        // double sum could differ in the 4th decimal (§5.4.2)
        round(sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double"), 4)
          .as("revenue"))
    assert(salted.except(plain).isEmpty && plain.except(salted).isEmpty)
  }

  test("join_bucketed_colocated: sort-merge join with NO shuffle exchange") {
    val df = ScaleJoins.queries("join_bucketed_colocated")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
    // the join inputs are bucketed on the join key: NO exchange keyed
    // on either join key may exist anywhere (the groupBy/orderBy
    // exchanges on o_orderstatus are expected and fine)
    assert(!plan.contains("Exchange hashpartitioning(l_orderkey") &&
      !plan.contains("Exchange hashpartitioning(o_orderkey"),
      s"bucketed join still shuffles on the join key:\n$plan")
    assert(plan.contains("Bucketed: true"), s"scan not bucketed:\n$plan")
  }

  test("join_skew_aqe: AQE splits the hot partition (skew marker in " +
      "the executed SMJ) and results equal the plain join") {
    ScaleJoins.withSkewConfs(spark) {
      val df = ScaleJoins.skewAqePlan(spark, sf)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      val lower = plan.toLowerCase
      assert(lower.contains("skew"),
        s"no skew-split marker in the executed plan:\n$plan")
      assert(plan.contains("SortMergeJoin"),
        s"skew split requires a sort-merge join:\n$plan")
    }
    assert(spark.conf.get("spark.sql.autoBroadcastJoinThreshold") != "-1")
    // semantics: the split must not change results vs the hint-free
    // hot-keyed join at session confs
    val aqe = ScaleJoins.queries("join_skew_aqe")(spark, sf)
    val plain = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_extendedprice"))
      .withColumn("hk",
        when(pmod(col("l_orderkey"), lit(20)) =!= 0, 1L)
          .otherwise(col("l_orderkey")))
      .join(Tables.orders(spark, sf)
        .select(col("o_orderkey"), col("o_orderpriority")),
        col("hk") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_items"),
        round(sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double"), 4)
          .as("revenue"))
    assert(aqe.except(plain).isEmpty && plain.except(aqe).isEmpty)
  }

  test("join_runtime_bloom injects bloom_filter_might_contain on the fact side") {
    ScaleJoins.withBloomConfs(spark) {
      val df = ScaleJoins.runtimeBloomPlan(spark, sf)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      // Spark 4.1 renders the injected filter as
      // might_contain(subquery ...) over a bloom_filter_agg build
      val lower = plan.toLowerCase
      assert(lower.contains("might_contain") &&
        lower.contains("bloom_filter_agg"),
        s"runtime bloom filter not injected:\n$plan")
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        s"bloom injection requires a shuffle join:\n$plan")
    }
    // and the conf scope must restore cleanly
    assert(spark.conf.get("spark.sql.autoBroadcastJoinThreshold") != "-1")
  }

  test("join_dpp_partition_pruned injects a dynamic pruning subquery " +
      "into the fact scan") {
    val df = ScaleJoins.queries("join_dpp_partition_pruned")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"no dynamic partition pruning in the fact scan:\n$plan")
    // only the 2 conversion types may survive the pruned join
    val types = df.collect().map(_.getString(0)).toSet
    assert(types == Set("purchase", "signup"))
  }

  test("join_interval_bucketed pair counts equal the plain interval join") {
    // the cell rewrite must be a pure plan transformation: same pairs,
    // same groups, as the declared range-join key
    val bucketed = ScaleJoins.queries("join_interval_bucketed")(spark, sf)
      .select(col("a_type"), col("n_pairs"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val plain = graft.operators.Joins.queries("join_interval_events")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bucketed == plain,
      s"cell rewrite changed the join result: $bucketed vs $plain")
  }
}
