package graft

/** Semantic invariants for the round-9 statistical operators — the
  * properties the hash oracle can't see (monotonicity, probability
  * bounds, estimator behavior).
  */
class Analytics5Spec extends GraftSuite {

  test("analytics_survival_km: log-survival non-increasing, risk set " +
    "telescopes exactly") {
    val rows = SparkEntry.queries("analytics_survival_km")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(0)).foreach { case (seg, rs) =>
      val sorted = rs.sortBy(_.getLong(1))
      // risk set: n_risk(t_{i+1}) = n_risk(t_i) − d_i − c_i
      sorted.iterator.sliding(2).withPartial(false).foreach { p =>
        assert(p(1).getLong(2) ==
          p(0).getLong(2) - p(0).getLong(3) - p(0).getLong(4),
          s"$seg: risk set must shrink by exactly the exits")
        assert(p(1).getDouble(5) <= p(0).getDouble(5) + 1e-9,
          s"$seg: log-survival must be non-increasing")
      }
      assert(sorted.head.getDouble(5) <= 0.0 + 1e-9,
        s"$seg: log-survival starts <= 0")
      // every exit is counted once: first n_risk = total exits
      assert(sorted.head.getLong(2) ==
        sorted.map(r => r.getLong(3) + r.getLong(4)).sum,
        s"$seg: first risk set must equal total customers")
    }
  }

  test("dq_benford_test: 9 digits, shares sum to 1, chi2 constant and " +
    "non-negative") {
    val rows = SparkEntry.queries("dq_benford_test")(spark, sf).collect()
    assert(rows.length == 9, "digit spine must produce exactly 9 rows")
    assert(rows.map(_.getString(0)).toSet == (1 to 9).map(_.toString).toSet)
    val shareSum = rows.map(_.getDouble(3)).sum
    assert(math.abs(shareSum - 1.0) < 1e-2,
      s"observed shares sum to $shareSum, expected ~1 (floor-quantized)")
    val chi2s = rows.map(_.getDouble(4)).distinct
    assert(chi2s.length == 1, "chi2 must be identical on every row")
    assert(chi2s.head >= 0.0)
  }

  test("sample_poisson_bootstrap: 16 replicates, E[W]=1 concentration, " +
    "zero-weight share near 1/e") {
    val rows = SparkEntry.queries("sample_poisson_bootstrap")(spark, sf)
      .collect()
    assert(rows.length == 16)
    val n = rows.head.getLong(1)
    rows.foreach { r =>
      assert(r.getLong(1) == n, "every replicate sees every row")
      // Poisson(1): n_eff/n within ±10% of 1, n_zero/n within ±10%
      // of 1/e (n >= 1500 at the smallest fixture → ~2.6% sd)
      val eff = r.getLong(2).toDouble / n
      val zero = r.getLong(3).toDouble / n
      assert(math.abs(eff - 1.0) < 0.1, s"rep ${r.getLong(0)}: n_eff/n=$eff")
      assert(math.abs(zero - math.exp(-1.0)) < 0.1,
        s"rep ${r.getLong(0)}: n_zero/n=$zero")
      assert(r.getDouble(4) > 0.0)
    }
    // replicates must actually differ (distinct hash streams)
    assert(rows.map(_.getDouble(4)).distinct.length > 1,
      "bootstrap totals are identical across replicates — weights " +
        "are not replicate-dependent")
  }

  test("analytics_ks_test: all 10 segment pairs, D in [0,1], exact " +
    "match vs a driver-side ECDF mirror") {
    val rows = SparkEntry.queries("analytics_ks_test")(spark, sf)
      .collect()
    assert(rows.length == 10, "C(5,2) segment pairs expected")
    rows.foreach(r =>
      assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0))
    // mirror one pair exactly
    val r0 = rows.head
    val (s1, s2) = (r0.getString(0), r0.getString(1))
    val data = Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf),
        org.apache.spark.sql.functions.col("o_custkey") ===
          org.apache.spark.sql.functions.col("c_custkey"))
      .select("c_mktsegment", "o_orderkey", "o_totalprice")
      .collect()
      .map(r => (r.getString(0), r.getLong(1),
        BigDecimal(r.getDouble(2)).setScale(2, BigDecimal.RoundingMode.HALF_UP)))
      .filter(t => t._1 == s1 || t._1 == s2)
      .sortBy(t => (t._3, t._1, t._2))
    val n1 = data.count(_._1 == s1).toLong
    val n2 = data.count(_._1 == s2).toLong
    var c1 = 0L; var c2 = 0L; var maxd = 0L
    data.zipWithIndex.foreach { case (t, i) =>
      if (t._1 == s1) c1 += 1 else c2 += 1
      // ECDFs step only after ALL ties of a value: the sup is
      // evaluated at tie-group ends, never inside a tied run
      val lastOfTie = i == data.length - 1 || data(i + 1)._3 != t._3
      if (lastOfTie) maxd = math.max(maxd, math.abs(c1 * n2 - c2 * n1))
    }
    assert(r0.getLong(2) == n1 && r0.getLong(3) == n2)
    assert(r0.getDouble(4) == math.floor(
      maxd.toDouble / (n1.toDouble * n2.toDouble) * 10000.0) / 10000.0,
      s"KS D mismatch for ($s1,$s2)")
  }

  test("agg_pythagorean_means: HM <= GM <= AM ordering holds on the " +
    "log scale") {
    val rows = SparkEntry.queries("agg_pythagorean_means")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (am, logGm, hm) =
        (r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(math.log(hm) <= logGm + 1e-6 &&
        logGm <= math.log(am) + 1e-6,
        s"${r.getString(0)}: ln(HM)=${math.log(hm)} <= $logGm <= " +
          s"ln(AM)=${math.log(am)} violated")
    }
  }

  test("dq_monotonicity_check: inversions bounded, worst backstep " +
    "positive iff inversions exist") {
    val rows = SparkEntry.queries("dq_monotonicity_check")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, inv, worst, mono) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4))
      assert(inv <= n - 1)
      assert(mono == (inv == 0L))
      assert((worst > 0L) == (inv > 0L),
        s"${r.getString(0)}: backstep/inversion inconsistency")
    }
  }

  test("analytics_theil_decomposition: T_between + T_within equals " +
    "the directly-computed total Theil index (additivity identity)") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("analytics_theil_decomposition")(
      spark, sf).collect()
    assert(rows.nonEmpty)
    val tB = rows.head.getDouble(4)
    val tW = rows.head.getDouble(5)
    assert(rows.forall(r => r.getDouble(4) == tB && r.getDouble(5) == tW))
    assert(tB >= -1e-6 && tW >= -1e-6, "Theil components are >= 0")
    // direct total-T on the driver from the same per-customer revenue
    val xs = Tables.orders(spark, sf)
      .groupBy("o_custkey")
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("x"))
      .collect().map(_.getDecimal(1).doubleValue())
    val mu = xs.sum / xs.length
    val tTotal = xs.map(x => (x / mu) * math.log(x / mu)).sum / xs.length
    assert(math.abs((tB + tW) - tTotal) < 1e-4,
      s"decomposition broken: $tB + $tW != $tTotal")
  }

  test("analytics_hhi_concentration: HHI within [10000/n_firms, " +
    "10000], top share consistent") {
    val rows = SparkEntry.queries("analytics_hhi_concentration")(
      spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nf, hhi, top) = (r.getLong(1), r.getDouble(2), r.getDouble(3))
      assert(hhi >= 10000.0 / nf - 1.0 && hhi <= 10000.0 + 1e-6,
        s"nation ${r.getInt(0)}: HHI $hhi outside [10000/$nf, 10000]")
      assert(hhi >= top * top * 10000.0 - 1.0,
        "HHI must be at least the top firm's squared share")
      assert(top > 0.0 && top <= 1.0)
    }
  }

  test("timeseries_bollinger_breach: breach rate consistent with a " +
    "2-sigma band (rare but present)") {
    val rows = SparkEntry.queries("timeseries_bollinger_breach")(
      spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nw, hi, lo) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(nw > 0)
      // 2-sigma over a 7-point window: breaches must be a small
      // minority of windows (Chebyshev: < 25%, typically ~5%)
      assert(hi + lo <= nw / 4,
        s"${r.getString(0)}: ${hi + lo} breaches of $nw windows " +
          "is not a 2-sigma band")
    }
  }

  test("analytics_runs_test: run-count identity R <= n1+n2, z " +
    "matches the three integers") {
    val rows = SparkEntry.queries("analytics_runs_test")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (runs, n1, n2) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(runs >= 1 && runs <= n1 + n2)
      assert(runs <= 2 * math.min(n1, n2) + 1,
        "run count exceeds its combinatorial maximum")
      val mu = 2.0 * n1 * n2 / (n1 + n2) + 1.0
      assert(r.getDouble(4) == math.floor(mu * 10000.0) / 10000)
      val z = (runs - mu) / math.sqrt((mu - 1.0) * (mu - 2.0)
        / (n1 + n2 - 1))
      assert(r.getDouble(5) == math.floor(z * 10000.0) / 10000,
        s"${r.getString(0)}: z mismatch")
    }
  }

  test("analytics_pareto_skyline: no skyline member dominates " +
    "another, and every non-member is dominated (brute force)") {
    import org.apache.spark.sql.functions._
    val sky = SparkEntry.queries("analytics_pareto_skyline")(spark, sf)
      .collect().map(r => (r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(sky.nonEmpty)
    // skyline is a staircase: price strictly increasing, qty strictly
    // increasing down the rank order
    val byRank = sky.sortBy(_._2)
    assert(byRank.zip(byRank.tail).forall { case (a, b) =>
      a._2 <= b._2 && a._3 < b._3 }, "skyline must be a staircase")
    // brute-force dominance check on the driver
    val all = Tables.lineitem(spark, sf)
      .groupBy(col("l_partkey")).agg(count(lit(1)).as("n"),
        sum(col("l_extendedprice").cast("decimal(18,2)")).as("sp"),
        sum(col("l_quantity").cast("decimal(18,2)")).as("sq"))
      .collect().map { r =>
        val n = r.getLong(1)
        (r.getLong(0),
          math.floor(r.getDecimal(2).doubleValue() / n * 100.0).toLong,
          math.floor(r.getDecimal(3).doubleValue() * 100.0).toLong)
      }
    def dominates(a: (Long, Long, Long), b: (Long, Long, Long)) =
      a._2 <= b._2 && a._3 >= b._3 && (a._2 < b._2 || a._3 > b._3 ||
        (a._2 == b._2 && a._3 == b._3 && a._1 < b._1))
    val skySet = sky.map(_._1).toSet
    all.filterNot(p => skySet(p._1)).foreach { p =>
      assert(all.exists(q => skySet(q._1) && dominates(q, p)),
        s"part ${p._1} excluded but undominated")
    }
  }

  test("sample_kfold_cv_eval: folds partition the corpus, train " +
    "means bracket the global mean, MAE positive") {
    val rows = SparkEntry.queries("sample_kfold_cv_eval")(spark, sf)
      .collect()
    assert(rows.length == 5)
    val n = rows.map(_.getLong(1)).sum
    assert(n == Tables.orders(spark, sf).count(),
      "folds must partition every order exactly once")
    val means = rows.map(_.getDouble(2))
    // complement means straddle the global mean: min <= global <= max
    assert(means.max - means.min < 0.2 * means.max,
      "complement train means should be close to each other")
    rows.foreach(r => assert(r.getDouble(3) > 0.0, "MAE must be > 0"))
  }

  test("stage_incremental_agg_maintenance: maintained == recomputed " +
    "on every segment (the IVM contract)") {
    val rows = SparkEntry.queries("stage_incremental_agg_maintenance")(
      spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(7),
        s"${r.getString(0)}: maintained aggregate diverged from the " +
          s"full recompute")
      assert(r.getLong(3) == r.getLong(4))
      assert(r.getDouble(5) == r.getDouble(6))
      assert(r.getLong(1) > 0 && r.getLong(2) > 0,
        "both epochs must be non-empty for the test to be load-bearing")
    }
  }

  test("sample_low_discrepancy_vdc: ~10% rate with the low-" +
    "discrepancy gap bound no Bernoulli sample satisfies") {
    val rows = SparkEntry.queries("sample_low_discrepancy_vdc")(
      spark, sf).collect()
    assert(rows.nonEmpty)
    val n = rows.map(_.getLong(1)).sum
    val k = rows.map(_.getLong(2)).sum
    assert(math.abs(k.toDouble / n - 0.1) < 0.02,
      s"global rate ${k.toDouble / n} far from 10%")
    // van der Corput: kept ranks are near-periodic — max gap is
    // O(1/rate); a geometric (Bernoulli) tail would blow past this
    val maxGap = rows.head.getLong(4)
    assert(maxGap <= 16L,
      s"max gap $maxGap exceeds the low-discrepancy bound (~1/rate)")
  }

  test("agg_gini_split_scan: impurity bounded by the Gini max, " +
    "partitions consistent, ranked ascending") {
    val rows = SparkEntry.queries("agg_gini_split_scan")(spark, sf)
      .collect()
    assert(rows.nonEmpty && rows.length <= 19)
    val ginis = rows.sortBy(_.getLong(0)).map(_.getDouble(4))
    assert(ginis.zip(ginis.tail).forall { case (a, b) => a <= b },
      "rank 1 must be the lowest impurity")
    rows.foreach { r =>
      assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 0.5 + 1e-9,
        s"binary Gini impurity must lie in [0, 0.5]: ${r.getDouble(4)}")
      assert(r.getLong(3) <= r.getLong(2),
        "left positives cannot exceed left count")
    }
  }

  test("agg_winsorized_mean: thresholds ordered, winsorized mean " +
    "between p05 and p95 and pulled toward the center") {
    val rows = SparkEntry.queries("agg_winsorized_mean")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (p05, p95) = (r.getDouble(2), r.getDouble(3))
      val (raw, win) = (r.getDouble(4), r.getDouble(5))
      assert(p05 < p95, s"${r.getString(0)}: p05 >= p95")
      assert(win >= p05 - 1e-9 && win <= p95 + 1e-9,
        s"${r.getString(0)}: winsorized mean outside the clamp band")
      // clamping a right-skew-free symmetric-ish price distribution
      // moves the mean only slightly — sanity band, not equality
      assert(math.abs(win - raw) < 0.2 * raw,
        s"${r.getString(0)}: winsorized mean implausibly far from raw")
    }
  }

  test("text_jsd_source_divergence: symmetric-by-construction bounds " +
    "0 <= JSD <= ln 2, all source pairs present") {
    val rows = SparkEntry.queries("text_jsd_source_divergence")(
      spark, sf).collect()
    val nSrc = Tables.documents(spark, sf).select("source")
      .distinct().count().toInt
    assert(rows.length == nSrc * (nSrc - 1) / 2)
    rows.foreach { r =>
      assert(r.getDouble(3) >= -1e-4 &&
        r.getDouble(3) <= math.log(2.0) + 1e-4,
        s"(${r.getString(0)},${r.getString(1)}): JSD ${r.getDouble(3)} " +
          s"outside [0, ln 2]")
      assert(r.getLong(2) > 0)
    }
  }

  test("analytics_association_rules: rule arithmetic consistent, " +
    "ranked by lift") {
    val rows = SparkEntry.queries("analytics_association_rules")(
      spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    val lifts = rows.map(_.getDouble(6))
    assert(lifts.zip(lifts.tail).forall { case (a, b) => a >= b },
      "rules must be ranked by descending lift")
    rows.foreach { r =>
      assert(r.getLong(3) >= 2L, "support floor n_ab >= 2 (r15: " +
        "pair repetition dilutes as the catalog grows; >= 3 was " +
        "empty at sf0.1)")
      assert(r.getDouble(5) > 0.0 && r.getDouble(5) <= 1.0,
        "confidence in (0,1]")
      assert(r.getDouble(4) > 0.0 && r.getDouble(4) < 1.0)
      assert(r.getDouble(6) > 0.0)
    }
  }

  test("timeseries_max_drawdown: drawdown bounded by peak, date " +
    "inside the series") {
    val rows = SparkEntry.queries("timeseries_max_drawdown")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (peak, dd) = (r.getDouble(2), r.getDouble(3))
      assert(dd >= 0.0 && dd <= peak,
        s"${r.getString(0)}: drawdown $dd outside [0, peak=$peak]")
      assert(r.getLong(1) > 0)
      assert(r.getDate(4) != null)
    }
  }

  test("profile_correlation_matrix: symmetric, unit diagonal, corr " +
    "bounded") {
    val rows = SparkEntry.queries("profile_correlation_matrix")(
      spark, sf).collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getDouble(2), r.getDouble(3)))).toMap
    assert(rows.size == 9)
    rows.foreach { case ((vi, vj), (cov, corr)) =>
      assert(rows((vj, vi)) == ((cov, corr)),
        s"matrix not symmetric at ($vi,$vj)")
      assert(math.abs(corr) <= 1.0 + 1e-9)
      if (vi == vj) {
        assert(corr == 1.0, s"diagonal corr must be exactly 1: $corr")
        assert(cov > 0.0, "variances positive")
      }
    }
  }

  test("analytics_mann_whitney: U bounded by n1*n2, effect size in " +
    "[-1,1], exact match vs a midrank driver mirror") {
    val rows = SparkEntry.queries("analytics_mann_whitney")(spark, sf)
      .collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      val (n1, n2) = (r.getLong(2), r.getLong(3))
      assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= (n1 * n2).toDouble)
      assert(math.abs(r.getDouble(5)) <= 1.0 + 1e-9)
    }
    val r0 = rows.head
    val (s1, s2) = (r0.getString(0), r0.getString(1))
    val data = Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf),
        org.apache.spark.sql.functions.col("o_custkey") ===
          org.apache.spark.sql.functions.col("c_custkey"))
      .select("c_mktsegment", "o_orderkey", "o_totalprice")
      .collect()
      .map(r => (r.getString(0), r.getLong(1),
        BigDecimal(r.getDouble(2)).setScale(2, BigDecimal.RoundingMode.HALF_UP)))
      .filter(t => t._1 == s1 || t._1 == s2)
      .sortBy(t => (t._3, t._1, t._2))
    val n1 = data.count(_._1 == s1).toLong
    val n2 = data.count(_._1 == s2).toLong
    // midranks: tie group shares (first+last)/2
    val byP = data.zipWithIndex.groupBy(_._1._3)
    var r1x2 = 0L
    byP.foreach { case (_, g) =>
      val fst = g.map(_._2).min + 1L; val lst = g.map(_._2).max + 1L
      r1x2 += g.count(_._1._1 == s1) * (fst + lst)
    }
    val twoU1 = 2L * n1 * n2 + n1 * (n1 + 1) - r1x2
    assert(r0.getDouble(4) == twoU1.toDouble / 2.0,
      s"U1 mismatch for ($s1,$s2)")
  }

  test("analytics_chi2_independence: 25 cells, chi2 constant >= 0, " +
    "dof = 16, expected sums to total") {
    val rows = SparkEntry.queries("analytics_chi2_independence")(
      spark, sf).collect()
    assert(rows.length == 25)
    val chi2s = rows.map(_.getDouble(4)).distinct
    assert(chi2s.length == 1 && chi2s.head >= 0.0)
    assert(rows.forall(_.getLong(5) == 16L))
    val nTot = rows.map(_.getLong(2)).sum
    val eTot = rows.map(_.getDouble(3)).sum
    assert(math.abs(eTot - nTot) < 0.1 * rows.length,
      s"expected counts must sum to the total: $eTot vs $nTot")
  }

  test("dq_psi_drift: 10 buckets, PSI non-negative (per-term " +
    "Gibbs inequality), shares sum to ~1") {
    val rows = SparkEntry.queries("dq_psi_drift")(spark, sf).collect()
    assert(rows.length == 10)
    val psis = rows.map(_.getDouble(5)).distinct
    assert(psis.length == 1 && psis.head >= 0.0,
      s"PSI must be one non-negative number, got ${psis.toSeq}")
    assert(math.abs(rows.map(_.getDouble(3)).sum - 1.0) < 0.02)
    assert(math.abs(rows.map(_.getDouble(4)).sum - 1.0) < 0.02)
  }

  test("sample_neyman_allocation: budget respected, realized sample " +
    "matches allocation, allocation ordered by N_h*S_h") {
    val rows = SparkEntry.queries("sample_neyman_allocation")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    val allocs = rows.map(_.getLong(3))
    assert(allocs.sum <= 600,
      s"floor allocation must not exceed the 600 budget: ${allocs.sum}")
    assert(allocs.sum > 600 - rows.length,
      "floor allocation can undershoot by at most strata-1 rows")
    rows.foreach { r =>
      assert(r.getLong(4) == r.getLong(3),
        s"stratum ${r.getString(0)}: realized sample != allocation")
      assert(r.getLong(3) <= r.getLong(1), "allocation exceeds stratum")
      assert(r.getDouble(2) > 0.0, "S_h must be positive")
    }
    // allocation must be monotone in N_h*S_h
    val byScore = rows.sortBy(r => r.getLong(1) * r.getDouble(2))
    assert(byScore.map(_.getLong(3)).sliding(2).forall(p =>
      p.length < 2 || p(0) <= p(1)),
      "allocation not monotone in N_h*S_h")
  }

  test("feature_woe_encode: IV constant and non-negative, WoE sign " +
    "tracks the class-share ratio") {
    val rows = SparkEntry.queries("feature_woe_encode")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    val ivs = rows.map(_.getDouble(4)).distinct
    assert(ivs.length == 1, "IV must be one corpus-level number")
    assert(ivs.head >= -1e-4, s"IV ${ivs.head} below zero")
    val post = rows.map(_.getLong(2)).sum
    val negt = rows.map(r => r.getLong(1) - r.getLong(2)).sum
    rows.foreach { r =>
      val (n, pos) = (r.getLong(1), r.getLong(2))
      val ratio = ((pos + 0.5) / post) / ((n - pos + 0.5) / negt)
      assert(math.signum(r.getDouble(3)) == math.signum(math.log(ratio))
        || math.abs(r.getDouble(3)) < 1e-3,
        s"${r.getString(0)}: WoE sign inconsistent with share ratio")
    }
  }

  test("timeseries_theil_sen: n_pairs = C(n_days,2) and the slope " +
    "matches a driver-side lower-median mirror") {
    val rows = SparkEntry.queries("timeseries_theil_sen")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    // driver mirror: daily quantized means → pairwise slopes → lower
    // median under the (m, xa, xb) total order
    val ev = Tables.events(spark, sf)
      .select(org.apache.spark.sql.functions.col("event_type"),
        org.apache.spark.sql.functions.to_date(
          org.apache.spark.sql.functions.date_trunc("day",
            org.apache.spark.sql.functions.col("ts"))).as("day"),
        org.apache.spark.sql.functions.col("value")
          .cast("decimal(18,2)").as("v"))
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toLocalDate,
        r.getDecimal(2)))
    val daily = ev.groupBy(t => (t._1, t._2)).map { case ((ty, dy), g) =>
      val s = g.map(_._3).reduce(_.add(_)) // exact decimal sum
      val dv = s.doubleValue() / g.length
      (ty, dy.toEpochDay - java.time.LocalDate.parse("2024-01-01")
        .toEpochDay, math.floor(dv * 10000).toLong)
    }.toSeq
    rows.foreach { r =>
      val (ty, nDays, nPairs) =
        (r.getString(0), r.getLong(1), r.getLong(2))
      assert(nPairs == nDays * (nDays - 1) / 2,
        s"$ty: pair count must be C(n_days, 2) on a gap-free series")
      val pts = daily.filter(_._1 == ty).map(t => (t._2, t._3)).sorted
      val slopes = (for {
        i <- pts.indices; j <- (i + 1) until pts.length
      } yield ((pts(j)._2 - pts(i)._2).toDouble
        / (pts(j)._1 - pts(i)._1).toDouble,
        pts(i)._1, pts(j)._1)).sorted
      val med = slopes(((slopes.length + 1) / 2) - 1)._1
      assert(r.getDouble(3) == math.floor(med) / 10000.0,
        s"$ty: slope ${r.getDouble(3)} != mirror ${math.floor(med) / 10000.0}")
    }
  }

  test("text_lexical_diversity: bounds hapax <= types <= tokens and " +
    "ratios in (0,1]") {
    val rows = SparkEntry.queries("text_lexical_diversity")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, v, h) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(h <= v && v <= n, s"doc ${r.getLong(0)}: $h <= $v <= $n")
      assert(r.getDouble(4) > 0.0 && r.getDouble(4) <= 1.0)
      assert(r.getDouble(5) >= 0.0 && r.getDouble(5) <= 1.0)
      assert(r.getDouble(6) >= 0.0 && r.getDouble(6) <= 1.0 + 1e-9,
        s"doc ${r.getLong(0)}: Herdan C out of [0,1]")
    }
  }

  test("agg_winsorized_approx: sketch thresholds and mean track the " +
    "exact twin per segment (VERDICT r9 #4 contract)") {
    val approx = SparkEntry.queries("agg_winsorized_approx")(spark, sf)
      .collect().map(r => r.getString(0) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    val exact = SparkEntry.queries("agg_winsorized_mean")(spark, sf)
      .collect().map(r => r.getString(0) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(5))).toMap
    assert(approx.keySet == exact.keySet && approx.nonEmpty)
    exact.foreach { case (seg, (p05, p95, win)) =>
      val (a05, a95, awin) = approx(seg)
      // accuracy=1000 → rank error <= n/1000 order statistics; on the
      // fixture price distribution that is a sub-percent value shift
      assert(math.abs(a05 - p05) <= 0.02 * p05,
        s"$seg: p05 sketch $a05 vs exact $p05")
      assert(math.abs(a95 - p95) <= 0.02 * p95,
        s"$seg: p95 sketch $a95 vs exact $p95")
      assert(math.abs(awin - win) <= 0.005 * win,
        s"$seg: winsorized mean sketch $awin vs exact $win")
    }
  }

  test("analytics_ks_sketch: binned D̂ brackets the exact D within " +
    "the declared per-pair err_bound") {
    val sk = SparkEntry.queries("analytics_ks_sketch")(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5)))
      .toMap
    val ex = SparkEntry.queries("analytics_ks_test")(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(sk.keySet == ex.keySet && sk.size == 10)
    ex.foreach { case (pair, (n1, n2, d)) =>
      val (sn1, sn2, dHat, errB) = sk(pair)
      assert(sn1 == n1 && sn2 == n2,
        s"$pair: sample sizes differ between sketch and exact")
      assert(errB > 0.0 && errB <= 1.0)
      // binned sup is evaluated at bin edges only: a lower bound of
      // the true sup up to the declared bin-mass slack (+1e-4 floor
      // quantization on each side)
      assert(dHat <= d + 2e-4,
        s"$pair: sketch D $dHat exceeds exact D $d")
      assert(d <= dHat + errB + 2e-4,
        s"$pair: exact D $d outside sketch envelope $dHat + $errB")
    }
  }
}
