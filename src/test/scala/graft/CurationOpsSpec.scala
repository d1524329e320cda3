package graft

import org.apache.spark.sql.functions._
import graft.operators.CurationOps

/** Invariant tests for the corpus-curation block (CurationOps). */
class CurationOpsSpec extends GraftSuite {

  test("text_contamination_ngram: contaminated never exceeds train size; injected dup is caught") {
    val rows = CurationOps.queries("text_contamination_ngram")(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getLong(2) <= r.getLong(1)))
    // a doc that IS an eval doc's verbatim copy must be flagged: doc_id
    // 0 is in the eval slice (0 % 97 == 0); its full text under a
    // non-eval id shares every 5-gram
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val evalText = docs.filter(col("doc_id") === 0).select("text").head.getString(0)
    assert(evalText.split(" ").length >= 5, "fixture doc 0 long enough to shingle")
  }

  test("text_repetition_filter: kept <= docs and fractions are in [0,1]") {
    val rows = CurationOps.queries("text_repetition_filter")(spark, sf).collect()
    assert(rows.length == 5) // one per lang
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1))
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
      assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0)
    }
  }

  test("text_dedup_paragraph: shared-chunk counts are consistent") {
    val rows = CurationOps.queries("text_dedup_paragraph")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // occurrences of shared chunks can't exceed total chunks, and a
      // doc counted as shared implies at least one shared occurrence
      assert(r.getLong(3) <= r.getLong(1))
      assert((r.getLong(2) == 0) == (r.getLong(3) == 0))
    }
  }

  test("sim_hard_negatives: negatives always carry a different label, ranks are 1..3 per query") {
    val rows = CurationOps.queries("sim_hard_negatives")(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getInt(1) != r.getInt(4)), "label must differ from query label")
    val byQ = rows.groupBy(_.getLong(0))
    byQ.values.foreach { rs =>
      assert(rs.map(_.getInt(2)).sorted.sameElements(1 to rs.length))
      assert(rs.forall(r => r.getDouble(5) >= -1.0001 && r.getDouble(5) <= 1.0001))
    }
  }

  test("pipeline_curation_e2e: funnel is monotone and covers the corpus") {
    val rows = CurationOps.queries("pipeline_curation_e2e")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val counts = (1 to 6).map(r.getLong) // n_in ... n_kept
      assert(counts.zip(counts.tail).forall { case (a, b) => a >= b },
        s"funnel must be monotone non-increasing: ${r.mkString(",")}")
      assert(counts.last >= 0 && counts.head > 0)
    }
    val corpusTotal = Tables.documents(spark, sf)
      .filter(col("doc_id") % 97 =!= 0).count()
    assert(rows.map(_.getLong(1)).sum == corpusTotal,
      "per-lang n_in must partition the decontaminated corpus")
  }
}
