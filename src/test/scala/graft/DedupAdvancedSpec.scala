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
}
