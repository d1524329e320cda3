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

  test("rfm ntile arithmetic == native NTILE(5) on every residue class") {
    // ADVICE r14 (high): the old ⌊(rk−1)·5/n⌋+1 formula diverges from
    // SQL NTILE for n ≡ 2,3 (mod 5); the fixture cardinalities all sat
    // on agreeing residues. Pin the front-loaded derivation against
    // Spark's own window function on one n per residue class, plus the
    // n<5 corner the lazy-IF guards.
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    for (n <- Seq(3, 7, 8, 12, 13, 10, 14)) {
      val df = spark.range(1, n + 1).toDF("rk")
        .withColumn("gn", lit(n.toLong))
        .withColumn("arith", expr(
          """CAST(IF(rk <= (gn % 5L) * (gn DIV 5L + 1L),
                     (rk - 1L) DIV (gn DIV 5L + 1L),
                     (rk - 1L - gn % 5L) DIV (gn DIV 5L)) AS INT) + 1"""))
        .withColumn("native", ntile(5).over(Window.orderBy("rk")))
      val bad = df.filter(col("arith") =!= col("native")).count()
      assert(bad == 0, s"n=$n: arithmetic ntile != native NTILE(5)")
    }
  }

  test("agg_entropy: 0 <= entropy <= ln(5) for a 5-category distribution") {
    val rows = Analytics3.queries("agg_entropy")(spark, sf).collect()
    // sf0.001 leaves one of the 16 user buckets empty
    assert(rows.length >= 8 && rows.length <= 16)
    rows.foreach { r =>
      assert(r.getDouble(2) >= 0.0 && r.getDouble(2) <= math.log(5) + 1e-9)
    }
  }

  test("agg_countmin_heavy: one-sided error, exact on a collision-free row") {
    val rows = graft.operators.Analytics3
      .queries("agg_countmin_heavy")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (exact, est, over) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(est >= exact, "CMS can only overcount, never undercount")
      assert(over == est - exact)
    }
  }

  test("agg_bloom_membership: no false negatives, verdicts partition the batch") {
    val rows = graft.operators.Analytics3
      .queries("agg_bloom_membership")(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 2)
    rows.foreach { r =>
      val (maybe, n, dups) = (r.getBoolean(0), r.getLong(1), r.getLong(2))
      if (!maybe) assert(dups == 0,
        "a true duplicate escaped the Bloom filter (false negative)")
      assert(dups <= n)
    }
    val batchTotal = rows.map(_.getLong(1)).sum
    assert(batchTotal == Tables.documents(spark, sf)
      .filter(org.apache.spark.sql.functions.col("doc_id") % 3 === 0).count())
  }

  test("agg_kmv_distinct: k=64 estimate lands within the sketch's error envelope") {
    val rows = graft.operators.Analytics3
      .queries("agg_kmv_distinct")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, est, rel) = (r.getLong(1), r.getDouble(2), r.getDouble(3))
      if (n < 64) assert(est == n.toDouble, "below k the estimate must be exact")
      // KMV std error = 1/sqrt(k-2) ≈ 12.7%; 5σ is a generous
      // deterministic-fixture bound (the 5 groups share one sample)
      else assert(math.abs(rel) < 0.65, s"rel_err $rel out of envelope")
      assert(est > 0)
    }
  }

  test("timeseries_trend_ma: trend stays within its window's hv range") {
    val rows = graft.operators.Analytics3
      .queries("timeseries_trend_ma")(spark, sf).collect()
      .map(r => (r.getString(0), r.getDouble(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (_, rs) =>
      val hv = rs.map(_._2)
      rs.map(_._3).foreach { t =>
        // a mean of 7 window values cannot leave the series' range
        assert(t >= hv.min - 1e-4 && t <= hv.max + 1e-4)
      }
    }
  }

  test("timeseries_interpolate_linear: observed rows exact, gaps between neighbors") {
    import org.apache.spark.sql.functions._
    val rows = graft.operators.Analytics3
      .queries("timeseries_interpolate_linear")(spark, sf).collect()
    assert(rows.nonEmpty)
    // grid is contiguous per type: every hour between endpoints present
    val byType = rows.groupBy(_.getString(0))
    byType.foreach { case (_, rs) =>
      val hours = rs.map(_.getTimestamp(1).getTime).sorted
      assert(hours.sliding(2).forall {
        case Array(a, b) => b - a == 3600 * 1000L
        case _ => true
      }, "grid has holes")
      // interpolated values sit between (or at) their observed neighbors
      val vs = rs.sortBy(_.getTimestamp(1).getTime)
        .map(r => (r.getBoolean(2), r.getDouble(3)))
      var i = 0
      while (i < vs.length) {
        if (!vs(i)._1) {
          val prev = vs.take(i).reverse.find(_._1).map(_._2)
          val next = vs.drop(i + 1).find(_._1).map(_._2)
          assert(prev.isDefined && next.isDefined, "gap missing a neighbor")
          val (lo, hi) = (math.min(prev.get, next.get), math.max(prev.get, next.get))
          // floor-scale can dip 1e-4 below the true interpolant
          assert(vs(i)._2 >= lo - 1e-4 && vs(i)._2 <= hi + 1e-4,
            s"interpolant ${vs(i)._2} outside [$lo, $hi]")
        }
        i += 1
      }
    }
  }

  test("timeseries_ewma matches a driver-side trailing-8 recomputation") {
    import org.apache.spark.sql.functions._
    val hist = Tables.events(spark, sf)
      .select(col("event_type"), col("value"), col("event_id"),
        unix_micros(col("ts")).as("us"))
      .collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2), r.getLong(3)))
      .groupBy(_._1)
      .map { case (k, rows) =>
        k -> rows.sortBy(t => (t._4, t._3)) // (us, event_id) order
      }
    // driver EWMA per (type, event_id): weighted mean of trailing 8
    val expected = hist.iterator.flatMap { case (_, rows) =>
      rows.zipWithIndex.map { case ((_, _, id, _), i) =>
        val frame = rows.slice(math.max(0, i - 7), i + 1).map(_._2)
        val l = frame.length
        val num = frame.zipWithIndex
          .map { case (v, p) => v * math.pow(0.5, l - 1 - p) }.sum
        val den = (0 until l).map(p => math.pow(0.5, l - 1 - p)).sum
        id -> num / den
      }
    }.toMap
    val got = Analytics3.queries("timeseries_ewma")(spark, sf).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (id, v) = (r.getLong(0), r.getDouble(3))
      // driver sums in a different order than the engine's index fold —
      // allow fp slack above the 1e-4 floor-scale
      assert(math.abs(expected(id) - v) < 2e-4,
        s"event $id: driver=${expected(id)} engine=$v")
    }
  }

  test("analytics_markov_hitting: exactly matches a driver-side " +
    "integer-quantized h <- P*h replay; purchase is absorbing") {
    import org.apache.spark.sql.functions._
    val got = Analytics3.queries("analytics_markov_hitting")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(got.nonEmpty)
    assert(got.find(_._1 == "purchase").exists(_._3 == 1.0),
      "the absorbing state must have hit4 == 1")
    // rebuild the transition counts driver-side (same window order)
    val ev = graft.Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"), col("event_id"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val pair = ev.groupBy(_._1).values.flatMap { es =>
      val seq = es.sortBy(e => (e._3, e._4)).map(_._2).toSeq
      seq.zip(seq.drop(1))
    }.toSeq.groupBy(x => x).view.mapValues(_.size.toLong).toMap
    val tot = pair.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val states = (pair.keys.map(_._1) ++ pair.keys.map(_._2)).toSeq.distinct
    val Q = 1000000000000L
    var h: Map[String, Long] =
      states.map(st => st -> (if (st == "purchase") Q else 0L)).toMap
    (1 to 4).foreach { _ =>
      h = states.map { st =>
        st -> (if (st == "purchase") Q
               else {
                 val num = states.map(nx =>
                   BigInt(pair.getOrElse((st, nx), 0L)) * h(nx)).sum
                 tot.get(st).fold(0L)(t =>
                   math.floor(num.toDouble / t.toDouble).toLong)
               })
      }.toMap
    }
    got.foreach { case (st, nOut, hit4) =>
      assert(nOut == tot.getOrElse(st, 0L), s"$st out-count")
      assert(hit4 == h(st).toDouble / 1e12,
        s"$st: engine $hit4 != mirror ${h(st).toDouble / 1e12}")
    }
  }
}
