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
}
