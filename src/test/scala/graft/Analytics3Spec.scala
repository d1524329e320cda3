package graft

import graft.operators.Analytics3

/** Invariant tests for the third analytics wave. */
class Analytics3Spec extends GraftSuite {

  test("timeseries_ohlc: low <= open/close <= high on every bar") {
    val rows = Analytics3.queries("timeseries_ohlc")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (open, high, low, close) =
        (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))
      assert(low <= open && open <= high)
      assert(low <= close && close <= high)
      assert(r.getLong(6) >= 1)
    }
  }

  test("anomaly_mad: outliers are a strict subset and MAD is non-negative") {
    val rows = Analytics3.queries("anomaly_mad")(spark, sf).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      assert(r.getLong(2) < r.getLong(1), "not every point is an outlier")
      assert(r.getDouble(3) >= 0.0)
    }
  }

  test("analytics_rfm: buckets are 1..5 and customer counts sum to distinct customers") {
    val rows = Analytics3.queries("analytics_rfm")(spark, sf).collect()
    assert(rows.forall { r =>
      Seq(r.getInt(0), r.getInt(1), r.getInt(2)).forall(b => b >= 1 && b <= 5)
    })
    val total = rows.map(_.getLong(3)).sum
    val nCust = spark.read.parquet(s"$sf/orders.parquet")
      .select("o_custkey").distinct().count()
    assert(total == nCust)
  }

  test("agg_entropy: 0 <= entropy <= ln(5) for a 5-category distribution") {
    val rows = Analytics3.queries("agg_entropy")(spark, sf).collect()
    // sf0.001 leaves one of the 16 user buckets empty
    assert(rows.length >= 8 && rows.length <= 16)
    rows.foreach { r =>
      assert(r.getDouble(2) >= 0.0 && r.getDouble(2) <= math.log(5) + 1e-9)
    }
  }
}
