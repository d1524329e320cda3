package graft

import org.apache.spark.sql.functions._
import graft.operators.Aggregates

/** Property tests for the aggregate block — the "done" criterion for
  * the no-oracle key agg_approx_distinct_hll. */
class AggregatesSpec extends GraftSuite {

  test("agg_approx_distinct_hll within 3·rsd of exact distinct counts") {
    val approx = Aggregates.queries("agg_approx_distinct_hll")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tables.events(spark, sf)
      .groupBy("event_type").agg(countDistinct("user_id").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (k, n) =>
      val err = math.abs(approx(k) - n).toDouble / n
      assert(err <= 3 * 0.02, s"$k: approx=${approx(k)} exact=$n err=$err")
    }
  }

  test("agg_hll_sketch_merge estimate within 5% of exact distinct") {
    val approx = Aggregates.queries("agg_hll_sketch_merge")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1).toDouble).toMap
    val exact = Tables.events(spark, sf)
      .groupBy("event_type").agg(countDistinct("user_id").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (k, n) =>
      val err = math.abs(approx(k) - n) / n
      assert(err <= 0.05, s"$k: sketch=${approx(k)} exact=$n err=$err")
    }
  }

  test("agg_approx_topk matches exact top-5 counts (distinct values < sketch capacity)") {
    val got = graft.operators.Analytics2.queries("agg_approx_topk")(spark, sf)
      .collect().map(r => (r.getInt(1), r.getLong(2))).toMap
    assert(got.size == 5)
    // 50 distinct quantities < 64 sketch slots → per-item counts are
    // exact: every reported item must carry its TRUE count, and the
    // count multiset must equal the exact top-5 (rank order under
    // count ties may differ, item identity may not)
    val exactAll = Tables.lineitem(spark, sf)
      .groupBy(col("l_quantity").cast("int").as("q"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).toMap
    got.foreach { case (item, cnt) =>
      assert(exactAll.get(item).contains(cnt),
        s"sketch item $item count $cnt != exact ${exactAll.get(item)}")
    }
    val exactTop5 = exactAll.values.toSeq.sorted.reverse.take(5)
    assert(got.values.toSeq.sorted.reverse == exactTop5,
      s"top-5 count multiset differs: got=$got exactTop5=$exactTop5")
  }

  test("agg_percentile_approx within 2% relative error of exact percentiles") {
    val approx = Aggregates.queries("agg_percentile_approx")(spark, sf)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val exact = Aggregates.queries("agg_percentile")(spark, sf)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    exact.foreach { case (k, (p50, p95)) =>
      assert(math.abs(approx(k)._1 - p50) / p50 <= 0.02,
        s"$k p50: approx=${approx(k)._1} exact=$p50")
      assert(math.abs(approx(k)._2 - p95) / p95 <= 0.02,
        s"$k p95: approx=${approx(k)._2} exact=$p95")
    }
  }

  test("agg_percentile: p50 <= p95 and both within group min/max") {
    val rows = Aggregates.queries("agg_percentile")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(1) <= r.getDouble(2), s"p50 > p95 in ${r.getString(0)}")
    }
  }

  test("agg_grouping_sets: rollup totals are consistent across levels") {
    val rows = Aggregates.queries("agg_grouping_sets")(spark, sf).collect()
    val grand = rows.filter(_.getLong(2) == 3).map(_.getLong(3)).sum
    val leaves = rows.filter(_.getLong(2) == 0).map(_.getLong(3)).sum
    assert(grand == leaves, s"grand total $grand != sum of leaves $leaves")
  }
}
