package graft

import org.apache.spark.sql.functions._
import graft.operators.DedupAdvanced

/** Property tests for the near-dup block; the "done" criterion for the
  * no-oracle key dedup_simhash. */
class DedupAdvancedSpec extends GraftSuite {

  test("dedup_simhash: hamming distance is symmetric-bounded and zero for identical text") {
    val rows = DedupAdvanced.queries("dedup_simhash")(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall { r =>
      val h = r.getInt(2); h >= 0 && h <= 64
    })
    // identical documents must produce identical simhashes: duplicate a
    // doc under two ids and run it through the PRODUCTION builder
    import spark.implicits._
    val docs = Seq((1L, "alpha beta gamma delta"), (2L, "alpha beta gamma delta"),
      (3L, "zeta eta theta iota")).toDF("doc_id", "text")
    val sims = DedupAdvanced.simhash(docs)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(sims(1L) == sims(2L), "identical docs must hash identically")
    assert(sims(1L) != sims(3L), "different docs should differ")
    assert(sims.values.forall(_.length == 64))
  }

  test("dedup_minhash_lsh: jaccard values are valid and candidates are ordered pairs") {
    val rows = DedupAdvanced.queries("dedup_minhash_lsh")(spark, sf).collect()
    assert(rows.forall(r => r.getLong(0) < r.getLong(1)))
    assert(rows.forall(r => r.getDouble(2) >= 0.0 && r.getDouble(2) <= 1.0))
  }

  test("dedup_ngram_jaccard: jaccard(x,x) would be 1 — sampled pairs stay in [0,1]") {
    val rows = DedupAdvanced.queries("dedup_ngram_jaccard")(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getDouble(2) >= 0.0 && r.getDouble(2) <= 1.0))
  }

  test("canonicalizeUrl: host case, tracking params, mixed-param repair, trailing junk") {
    import org.apache.spark.sql.functions.col
    val cases = Seq(
      // host lowered, path case kept, trailing slash trimmed
      ("https://WWW.Ex.COM/KeepCase/", "https://www.ex.com/KeepCase"),
      // tracking-only query stripped entirely
      ("https://a.com/p?utm_source=x&ref=1", "https://a.com/p"),
      // tracking param FIRST, kept param after → '?&' repaired to '?'
      ("https://a.com/p?utm_c=x&id=2", "https://a.com/p?id=2"),
      // kept param first, tracking after → clean strip
      ("https://A.com/p?id=2&utm_c=x", "https://a.com/p?id=2"),
      // nothing to do
      ("https://a.com/p?id=3", "https://a.com/p?id=3"))
    import spark.implicits._
    val got = cases.map(_._1).toDF("url")
      .withColumn("canon", DedupAdvanced.canonicalizeUrl(col("url")))
      .collect().map(_.getString(1))
    got.zip(cases).foreach { case (g, (in, want)) =>
      assert(g == want, s"canonicalizeUrl($in) = $g, want $want")
    }
  }

  test("dedup_minhash_containment: containment dominates jaccard on every pair") {
    val rows = DedupAdvanced.queries("dedup_minhash_containment")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (cont, jac) = (r.getDouble(2), r.getDouble(3))
      // |A∩B|/min(|A|,|B|) ≥ |A∩B|/|A∪B| always — the whole point of
      // the asymmetric measure (subset pairs score 1.0 at tiny jaccard);
      // floor- vs HALF_UP-rounding may differ by one ulp-step
      assert(cont >= jac - 1e-4, s"containment $cont < jaccard $jac")
      assert(cont >= 0.0 && cont <= 1.0)
    }
  }

  test("dedup_minhash_icws: planted weighted duplicates — identical " +
      "weighted multisets collide on every sample; the estimator " +
      "tracks WEIGHTED (not set) Jaccard on a tf-skewed pair") {
    import spark.implicits._
    // tf frames fed straight to the production signature builder.
    // A/B identical weighted multisets; C disjoint; D shares A's
    // heavy feature but not its light ones: J_w(A,D) = 10/12 ≈ 0.83
    // while SET Jaccard is only 1/3 — the case uniform MinHash
    // underestimates.
    val tf = Seq(
      (1L, "x y", 10L), (1L, "y z", 1L), (1L, "z q", 1L),
      (2L, "x y", 10L), (2L, "y z", 1L), (2L, "z q", 1L),
      (3L, "a b", 5L), (3L, "b c", 5L),
      (4L, "x y", 10L), (4L, "m n", 1L), (4L, "n o", 1L)
    ).toDF("doc_id", "w", "tf")
    val sig = DedupAdvanced.icwsWide(tf).collect()
      .map(r => r.getLong(0) -> (1 to 8).map(r.getString)).toMap
    assert(sig(1L) == sig(2L),
      "identical weighted multisets must produce identical signatures")
    assert(sig(1L) != sig(3L), "disjoint multisets must differ")
    // weighted sensitivity: agreement(A, D) should track J_w ≈ 0.83,
    // far above the set-Jaccard 1/3 a uniform MinHash estimates
    val agreeAD = sig(1L).zip(sig(4L)).count { case (a, b) => a == b }
    assert(agreeAD >= 5,
      s"ICWS agreement $agreeAD/8 does not reflect J_w=0.83 — " +
        "weighting is broken (uniform MinHash would sit near 1/3)")
    // every sample of a weighted doc must be one of ITS features
    assert(sig(3L).forall(Set("a b", "b c")),
      "signature contains a feature outside the document")
  }

  test("dedup_minhash_icws: fixture floor-boundary margin — the " +
      "t = floor(ln(tf)/r + beta) quantization sits far from every " +
      "integer boundary (the weighted-reservoir ADVICE r13 pattern)") {
    // A 1-ulp cross-engine ln() divergence perturbs ln(tf)/r + beta
    // by ~|ln tf/r|·2.3e-16 (+ the r-side error, same order). tf=1
    // rows have ln(tf)=0 EXACTLY (t = floor(beta), beta ∈ (0,1), no
    // boundary risk), so audit the tf>1 rows of the real fixture.
    val tf = DedupAdvanced.wordTf(spark, sf).filter(col("tf") > 1)
    def unif(c: org.apache.spark.sql.Column) =
      (c.cast("double") + 1.0) / 281474976710656.0
    val rows = (0 until 8).map { i =>
      val r = -log(
        unif(expr(s"CAST(conv(substring(md5(concat('r$i:', w)), 1, 12), 16, 10) AS BIGINT)")) *
        unif(expr(s"CAST(conv(substring(md5(concat('r$i:', w)), 13, 12), 16, 10) AS BIGINT)")))
      val b = (expr(s"CAST(conv(substring(md5(concat('r$i:', w)), 25, 8), 16, 10) AS BIGINT)")
        .cast("double") + 1.0) / 4294967296.0
      val x = log(col("tf").cast("double")) / r + b
      val m = least(x - floor(x), floor(x) + lit(1.0) - x)
      val pert = (abs(log(col("tf").cast("double")) / r) + lit(1.0)) * 4.6e-16
      tf.agg(min(m / pert).as("mr"))
    }.reduce(_ unionAll _)
    val minRatio = rows.agg(min(col("mr"))).collect()(0).getDouble(0)
    assert(minRatio > 10,
      f"a fixture t-quantization sits only $minRatio%.1f " +
        "perturbation-widths from an integer boundary")
  }

  test("dedup_icws_band_eval: S-curve shape — candidate volume is " +
      "monotone in band count at fixed signature width, hits never " +
      "exceed truth or candidates, and the 8x1 geometry is " +
      "recall-complete over banded truth pairs") {
    val rows = DedupAdvanced.queries("dedup_icws_band_eval")(spark, sf)
      .collect()
    assert(rows.length == 3, "one row per declared geometry")
    val byBands = rows.map(r => (r.getInt(0), r.getInt(1), r.getLong(2),
      r.getLong(3), r.getLong(4))).sortBy(-_._1)
    assert(byBands.map(t => t._1 * t._2).forall(_ == 8),
      "every geometry spends exactly the 8 signature samples")
    // more, narrower bands can only ADD collision opportunities:
    // an (r=2k)-row band key match implies both (r=k)-halves match
    assert(byBands.map(_._3).sliding(2).forall(p => p(0) >= p(1)),
      s"candidate volume not monotone in band count: $byBands")
    byBands.foreach { case (_, _, nc, nt, nh) =>
      assert(nh <= nt && nh <= nc, s"hits exceed truth/candidates")
    }
    // at 8x1 a truth pair (J_w >= 0.5) collides unless all 8 samples
    // differ — P ~ (1-J_w)^8 <= 0.4%; the fixture's truth pairs are
    // J_w ~ 0.97+ planted near-dups, so recall there must be 1.0
    val (_, _, _, nt8, nh8) = byBands.head
    if (nt8 > 0) assert(nh8 == nt8,
      "8x1 missed a planted near-dup — signature build is broken")
  }
}
