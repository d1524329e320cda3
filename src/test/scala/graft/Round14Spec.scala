package graft

import org.apache.spark.sql.functions._

/** Round-14 additions: MATCH_RECOGNIZE alternation and the Hilbert
  * sink. Plan pins follow the ADVICE r13 rule — invariants (≤N
  * exchanges, operator presence), not stage-id literals. */
class Round14Spec extends GraftSuite {

  test("window_pattern_alternation: one user-grain shuffle, no joins — " +
      "both branch chains and the greatest-carry ride ONE window pass") {
    val df = SparkEntry.queries("window_pattern_alternation")(spark, sf)
    val rows = df.collect()
    val phys = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    // the alternation compiles to stacked window functions over the
    // SAME (user_id) partitioning: exactly one user-grain hash
    // exchange feeds every carry chain (the only other exchange is
    // the final multi-countDistinct's Expand aggregate — gid-keyed,
    // a 6-row synopsis); a per-branch self-join rewrite would add
    // joins and extra user-grain walks
    assert(!phys.contains("Join"),
      s"alternation must be join-free:\n$phys")
    // match the user-grain exchange precisely: key list = user_id
    // ALONE + partition count (the Expand exchange's key list starts
    // with user_id but carries the gid columns too)
    val userEx = "Exchange hashpartitioning\\(user_id#\\d+L?, \\d+\\)".r
      .findAllIn(phys).size
    assert(userEx <= 1,
      s"expected <=1 user-grain hash exchange, got $userEx:\n$phys")
    // reach invariants: either-branch reach dominates each branch and
    // is bounded by their sum; downstream steps only attrit
    val r = rows(0)
    val Seq(nUsers, nSignup, nView, nClick, nEither, nPurchase) =
      (0 until 6).map(r.getLong)
    assert(nSignup <= nUsers && nEither <= nSignup)
    assert(nEither >= math.max(nView, nClick),
      s"either-reach $nEither below a single branch ($nView/$nClick)")
    assert(nEither <= nView + nClick)
    assert(nPurchase <= nEither,
      s"purchase reach $nPurchase exceeds alternation reach $nEither")
    // the branches are genuinely asymmetric on the fixture (4 h click
    // deadline vs 12 h view deadline) — if they collapse to the same
    // reach the alternation demo degenerates to a disjunctive filter
    assert(nView != nClick,
      "branch deadlines produced identical reach — alternation is " +
        "indistinguishable from a single disjunctive step on this fixture")
  }

  test("window_pattern_kleene: the (user, chain) validity window " +
      "rides the same user partitioning — one user-grain shuffle, " +
      "join-free; chain counts are consistent") {
    val df = SparkEntry.queries("window_pattern_kleene")(spark, sf)
    val r = df.collect()(0)
    val phys = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(!phys.contains("Join"), s"kleene must be join-free:\n$phys")
    // HashPartitioning(user_id) satisfies the (user_id, cid) window's
    // ClusteredDistribution — the chain-validity pass adds NO exchange
    val userEx = "Exchange hashpartitioning\\(user_id#\\d+L?, \\d+\\)".r
      .findAllIn(phys).size
    assert(userEx <= 1,
      s"expected <=1 user-grain hash exchange, got $userEx:\n$phys")
    val Seq(_, _, nChains, nValid, nChainUsers, nPurchase) =
      (0 until 6).map(r.getLong)
    assert(nValid <= nChains, "valid chains exceed total chains")
    assert(nValid > 0 && nValid < nChains,
      s"chain validity is vacuous on the fixture ($nValid/$nChains) — " +
        "the 12h head deadline filters nothing or everything")
    assert(nPurchase <= nChainUsers,
      "purchase reach exceeds valid-chain reach")
  }

  test("window_pattern_negation: absence split is consistent and " +
      "non-vacuous; join-free single user-grain walk") {
    val df = SparkEntry.queries("window_pattern_negation")(spark, sf)
    val r = df.collect()(0)
    val phys = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(!phys.contains("Join"), s"negation must be join-free:\n$phys")
    val Seq(_, _, nDead, nPure, nTaint) = (0 until 5).map(r.getLong)
    assert(nPure + nTaint == nDead,
      s"pure $nPure + tainted $nTaint != deadline purchases $nDead")
    assert(nPure > 0 && nTaint > 0,
      s"the negation is vacuous on the fixture ($nPure/$nTaint)")
  }

  test("window_pattern_quantified: B{2,4} is strictly tighter than " +
      "B+ on the same chains; join-free single user-grain walk") {
    val df = SparkEntry.queries("window_pattern_quantified")(spark, sf)
    val r = df.collect()(0)
    val phys = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(!phys.contains("Join"), s"quantifier must be join-free:\n$phys")
    val userEx = "Exchange hashpartitioning\\(user_id#\\d+L?, \\d+\\)".r
      .findAllIn(phys).size
    assert(userEx <= 1,
      s"expected <=1 user-grain hash exchange, got $userEx:\n$phys")
    val Seq(_, quantReach, pQuant, pPlus, _) = (0 until 5).map(r.getLong)
    // the {2,4} window can only REMOVE matches B+ admits
    assert(pQuant <= pPlus,
      s"quantified purchases $pQuant exceed B+ purchases $pPlus")
    assert(pQuant < pPlus,
      "the quantifier gated nothing on the fixture — vacuous demo")
    assert(quantReach > 0, "no chain ever reached its 2nd view")
  }

  test("stream_pattern_funnel: reach is monotone down the funnel and " +
      "matches the batch carry chain computed in-session") {
    val r = SparkEntry.queries("stream_pattern_funnel")(spark, sf)
      .collect()(0)
    val Seq(nUsers, nSignup, nView, nPurchase) = (0 until 4).map(r.getLong)
    assert(nSignup <= nUsers && nView <= nSignup && nPurchase <= nView,
      s"funnel reach not monotone: $nUsers/$nSignup/$nView/$nPurchase")
    // independent batch mirror with Spark windows (the oracle checks
    // vs DuckDB; this closes the triangle stream == Spark-batch)
    import org.apache.spark.sql.expressions.Window
    val H = 3600L * 1000000
    val w = Window.partitionBy("user_id").orderBy("us", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val b = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), col("event_type"),
        expr("unix_micros(ts)").as("us"))
      .withColumn("st0",
        max(when(col("event_type") === "signup", col("us"))).over(w))
      .withColumn("st1", max(when(col("event_type") === "view"
        && col("st0").isNotNull
        && col("us") - col("st0") <= 12 * H, col("us"))).over(w))
      .withColumn("st2", max(when(col("event_type") === "purchase"
        && col("st1").isNotNull
        && col("us") - col("st1") <= 8 * H, col("us"))).over(w))
      .agg(countDistinct(col("user_id")),
        countDistinct(when(col("st0").isNotNull, col("user_id"))),
        countDistinct(when(col("st1").isNotNull, col("user_id"))),
        countDistinct(when(col("st2").isNotNull, col("user_id"))))
      .collect()(0)
    assert((0 until 4).forall(i => b.getLong(i) == r.getLong(i)),
      s"stream != batch carry: stream=$r batch=$b")
  }

  test("withHilbert8: bijective on the 256x256 grid with unit-step " +
      "continuity (consecutive d differ by 1 in exactly one axis)") {
    val grid = spark.range(65536L)
      .select((col("id") % 256).as("hx"), expr("id DIV 256").as("hy"))
    val keyed = graft.operators.Lifecycle.withHilbert8(grid)
      .select(col("hkey"), col("hx"), col("hy"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // bijection: every d in [0, 65535] exactly once
    val byD = keyed.sortBy(_._1)
    assert(byD.zipWithIndex.forall { case ((d, _, _), i) => d == i.toLong },
      "hilbert distance is not a bijection on the full grid")
    // unit-step continuity — the property z-order LACKS (its jumps
    // are what blow up unaligned-bucket bboxes): walking the curve
    // in d order moves exactly one cell each step
    byD.sliding(2).foreach { case Array((_, x1, y1), (_, x2, y2)) =>
      assert(math.abs(x2 - x1) + math.abs(y2 - y1) == 1,
        s"non-unit step at d: ($x1,$y1) -> ($x2,$y2)")
      case _ =>
    }
    // locality on the FULL grid (the pure geometry claim, fixture-
    // independent — sparse small-sf fixtures can flip the census
    // either way): per unaligned 1000-cell bucket, Hilbert's bbox
    // area beats z-order's on average AND at the max (z-order's
    // power-of-two jumps are the outliers)
    def morton(x: Long, y: Long): Long = {
      def spread(v: Long) = (0 until 8).map(b =>
        ((v >> b) & 1L) << (2 * b)).sum
      spread(x) | (spread(y) << 1)
    }
    def census(ks: Array[(Long, Long, Long)]): (Double, Long) = {
      val bbs = ks.groupBy(_._1 / 1000).values.map { cells =>
        val xs = cells.map(_._2); val ys = cells.map(_._3)
        (xs.max - xs.min + 1) * (ys.max - ys.min + 1)
      }
      (bbs.sum.toDouble / bbs.size, bbs.max)
    }
    val (havg, hmax) = census(byD)
    val (zavg, zmax) = census(keyed.map { case (_, x, y) =>
      (morton(x, y), x, y) })
    assert(havg < zavg,
      s"hilbert avg bbox $havg not below z-order $zavg on the full grid")
    assert(hmax < zmax,
      s"hilbert max bbox $hmax not below z-order $zmax on the full grid")
  }

  test("sink_hilbert_curve: both curves census the same rows and the " +
      "read-back roundtrip drops nothing") {
    val rows = SparkEntry.queries("sink_hilbert_curve")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(rows.keySet == Set("hilbert", "zorder"))
    val nParts = Tables.part(spark, sf).count()
    assert(rows("hilbert") == nParts && rows("zorder") == nParts,
      s"census rows $rows != part count $nParts")
  }
}
