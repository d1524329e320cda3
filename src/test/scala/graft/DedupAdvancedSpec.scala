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
}
