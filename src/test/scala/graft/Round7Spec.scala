package graft

/** Round-7 family specs: plan-shape pins for the new graph / feature /
  * spatial / fusion keys (SURVEY §5.3.5 — prove the scale claims in
  * the EXECUTED plan) plus determinism/property checks the oracles
  * can't express. */
class Round7Spec extends GraftSuite {

  private def executedPlan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf)
    df.collect()
    // AQE's toString echoes "== Initial Plan ==" after the final plan;
    // keep only the final section or node counts double
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
  }

  test("graph_triangle_count wedge stage is equi-joins, no cartesian") {
    // sf0.01: the mod=200 sample is empty at sf0.001 and AQE collapses
    // every join to EmptyRelation — the shape only exists with edges
    val df = SparkEntry.queries("graph_triangle_count")(spark,
      SparkTestBase.sf001)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    // the 1-row synopsis crossJoins at the end are BNLJ by design;
    // what must NOT appear is an unkeyed pair enumeration
    assert(!plan.contains("CartesianProduct"),
      s"triangle join fell back to cartesian:\n$plan")
    assert(("SortMergeJoin".r.findAllIn(plan).size
      + "ShuffledHashJoin".r.findAllIn(plan).size
      + "BroadcastHashJoin".r.findAllIn(plan).size) >= 2,
      s"expected >=2 keyed joins for the wedge+closure stages:\n$plan")
  }

  test("spatial_knn_grid candidates come from a keyed join, no cartesian") {
    val plan = executedPlan("spatial_knn_grid")
    assert(!plan.contains("CartesianProduct"),
      s"grid join fell back to cartesian:\n$plan")
    assert(("SortMergeJoin".r.findAllIn(plan).size
      + "ShuffledHashJoin".r.findAllIn(plan).size
      + "BroadcastHashJoin".r.findAllIn(plan).size) >= 1,
      s"expected the (cell_x, cell_y) equi-join:\n$plan")
  }

  test("feature_scale_standardize broadcasts the stats side") {
    val plan = executedPlan("feature_scale_standardize")
    assert(plan.contains("BroadcastHashJoin"),
      s"stats join is not broadcast — two-pass shape lost:\n$plan")
  }

  test("text_vocab_oov_rate broadcasts the vocabulary membership join") {
    val plan = executedPlan("text_vocab_oov_rate")
    assert(plan.contains("BroadcastHashJoin"),
      s"vocab join is not broadcast:\n$plan")
  }

  test("analytics_ab_ttest reads events exactly once (one-pass arms)") {
    val plan = executedPlan("analytics_ab_ttest")
    assert("Scan parquet".r.findAllIn(plan).size == 1,
      s"expected a single events scan for both arms:\n$plan")
  }

  test("sample_balanced_class is reproducible and respects the cap") {
    val r1 = SparkEntry.queries("sample_balanced_class")(spark, sf).collect()
    val r2 = SparkEntry.queries("sample_balanced_class")(spark, sf).collect()
    assert(r1.map(_.toString).sorted.sameElements(r2.map(_.toString).sorted),
      "selection changed between runs")
    assert(r1.forall(_.getLong(2) <= 200), "class cap violated")
  }

  test("sim_reciprocal_rank_fusion scores are bounded by the two-ranker max") {
    val rows = SparkEntry.queries("sim_reciprocal_rank_fusion")(spark, sf)
      .collect()
    val maxRrf = 1.0 / 61 + 1.0 / 61
    assert(rows.nonEmpty, "no fused results")
    assert(rows.forall(_.getDouble(3) <= maxRrf + 1e-9),
      "rrf exceeds the theoretical two-ranker maximum")
    // a doc ranked by both rankers must outscore one ranked by only
    // one at the same rank position
    assert(rows.forall(r => r.getDouble(3) > 0.0), "non-positive rrf")
  }

  test("stage_partition_evolution pruning loses no rows and opens fewer files") {
    val rows = SparkEntry.queries("stage_partition_evolution")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    val opened = rows.head.getInt(3); val total = rows.head.getInt(4)
    assert(opened < total, s"pruning opened $opened of $total files")
    // pruned read must equal the full filtered scan
    import org.apache.spark.sql.functions._
    val expect = graft.Tables.orders(spark, sf)
      .filter(pmod(col("o_custkey"), lit(4)) === 1)
      .groupBy("o_orderstatus").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.map(r => r.getString(0) -> r.getLong(1)).toMap == expect,
      "pruned read diverges from the full filtered scan")
  }

  test("stage_concurrent_append rebase keeps both appends exactly once") {
    val rows = SparkEntry.queries("stage_concurrent_append")(spark, sf)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val all = graft.Tables.orders(spark, sf).count()
    assert(rows(3) == all, "v3 must contain base + A + B exactly once")
    assert(rows(1) < rows(2) && rows(2) < rows(3), "versions must grow")
  }

  test("scan_nested_struct_flatten prunes the nested schema to one leaf") {
    val plan = executedPlan("scan_nested_struct_flatten")
    // the struct scan must carry only meta.detail.prio — the price
    // and status legs must not be decoded
    val read = plan.split("ReadSchema:").last
    assert(read.contains("prio"), s"pruned leaf missing from scan:\n$plan")
    assert(!read.contains("price") && !read.contains("status"),
      s"nested schema pruning failed — sibling legs read:\n$plan")
  }

  test("agg_bitmap_distinct equals exact countDistinct") {
    import org.apache.spark.sql.functions._
    val got = SparkEntry.queries("agg_bitmap_distinct")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = graft.Tables.events(spark, sf)
      .groupBy("event_type").agg(countDistinct("user_id").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == exact, s"bitmap distinct diverged: $got vs $exact")
  }

  test("timeseries_autocorr output is one row per priority with n_days") {
    val rows = SparkEntry.queries("timeseries_autocorr")(spark, sf).collect()
    assert(rows.length == 5, s"expected 5 priority series, got ${rows.length}")
    assert(rows.forall(_.getLong(1) > 0), "empty series")
  }

  test("analytics_basket_copurchase pair join stays keyed, no cartesian") {
    val plan = executedPlan("analytics_basket_copurchase")
    assert(!plan.contains("CartesianProduct"),
      s"basket pair join fell back to cartesian:\n$plan")
  }

  test("stage_merge_on_read_deletes leaves base files untouched") {
    import org.apache.spark.sql.functions._
    SparkEntry.queries("stage_merge_on_read_deletes")(spark, sf).collect()
    // the delete commit must not have rewritten the base: reading it
    // directly still yields every customer row
    val base = spark.read.parquet(
      graft.sources.Staging.scratchPath("mordel") + "/base")
    assert(base.count() == graft.Tables.customer(spark, sf).count(),
      "MoR delete rewrote or truncated base data files")
  }

  test("window_rolling_distinct 7-day count dominates the 1-day count") {
    val rows = SparkEntry.queries("window_rolling_distinct")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getInt(2) >= r.getInt(1)),
      "rolling 7-day distinct smaller than single-day distinct")
  }

  test("agg_kmv_intersect estimate lands near the exact intersection") {
    val r = SparkEntry.queries("agg_kmv_intersect")(spark, sf)
      .collect().head
    val exact = r.getLong(3); val est = r.getDouble(4)
    assert(exact >= 0 && est >= 0)
    if (exact > 20)
      assert(math.abs(est - exact) / exact < 0.5,
        s"KMV intersect estimate $est too far from exact $exact")
  }

  test("sim_mips_transform augmented cosine descends with the IP ranking") {
    val rows = SparkEntry.queries("sim_mips_transform")(spark, sf)
      .collect().groupBy(_.getLong(0))
    rows.values.foreach { rs =>
      val byRank = rs.sortBy(_.getInt(1)).map(_.getDouble(4))
      // ranking breaks ties on round(ip, 4), so cos_aug may wiggle
      // within one 4-dp rounding step — monotone up to that granularity
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b - 1e-4 },
        "cos_aug not monotone in the inner-product ranking")
    }
  }

  test("sample_group_holdout has zero straddling users") {
    val rows = SparkEntry.queries("sample_group_holdout")(spark, sf)
      .collect()
    assert(rows.forall(_.getLong(3) == 0L), "user straddles both splits")
  }

  test("graph_degree_distribution buckets partition all nodes") {
    val rows = SparkEntry.queries("graph_degree_distribution")(spark, sf)
      .collect()
    assert(rows.nonEmpty, "no degree buckets")
    // bucket invariant: min/max inside [bucket, bucket+8)
    assert(rows.forall { r =>
      val b = r.getLong(0); val lo = r.getLong(2); val hi = r.getLong(3)
      lo >= b && hi < b + 8 && lo <= hi
    }, "degree bucket bounds violated")
  }
}
