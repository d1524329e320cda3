package graft

import org.apache.spark.sql.functions._

/** Round-9 curation operators: char-level substring dedup, boilerplate
  * n-grams, hashing-trick features. Oracle parity is preflight's job;
  * these pin the operator SEMANTICS (conservation, bounds,
  * determinism) at sf0.001.
  */
class Curation2Spec extends GraftSuite {

  test("text_substring_dedup_chars: spans bounded by doc, fps conserved") {
    val out = SparkEntry.queries("text_substring_dedup_chars")(spark, sf)
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (nf, ndf, nds, dc, ratio) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getDouble(5))
      assert(ndf <= nf, "duplicated fingerprints cannot exceed fingerprints")
      assert(nds <= ndf, "spans merge fingerprints, never multiply them")
      assert(ratio >= 0.0 && ratio <= 1.0, s"dup_ratio $ratio out of [0,1]")
      // a span covers at least one k-gram and at most chained k-gram mass
      if (ndf > 0) assert(dc >= 40 && dc <= ndf * 40,
        s"dup_chars $dc inconsistent with $ndf fingerprints of 40 chars")
    }
  }

  test("text_substring_dedup_chars: planted UNALIGNED duplicate is detected") {
    // two synthetic docs share a 91-char run at DIFFERENT byte offsets
    // (18 vs 0). A stride-aligned window grid misses this by
    // construction (the windows never line up) — the winnowing
    // guarantee (shared run ≥ k + w − 1 = 59 chars shares a selected
    // fingerprint hash) is exactly what this pins.
    import spark.implicits._
    val shared = "x".*(30) + "BANNER TEXT SHARED ACROSS DOCS " + "y".*(30)
    val docs = Seq(
      (900001L, "en", "srcA", "unique prefix one " + shared),
      (900002L, "en", "srcB", shared + " unique suffix two"))
      .toDF("doc_id", "lang", "source", "text")
    val tmp = java.nio.file.Files.createTempDirectory("c2spec").toString
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = SparkEntry.queries("text_substring_dedup_chars")(spark, tmp)
      .collect()
    assert(out.length == 2)
    out.foreach(r => assert(r.getLong(4) >= 40L,
      s"doc ${r.getLong(0)} missed the planted 91-char duplicate run"))
  }

  test("text_boilerplate_ngrams: one row per source, df bounded by docs") {
    val out = SparkEntry.queries("text_boilerplate_ngrams")(spark, sf)
      .collect()
    val nSrc = Tables.documents(spark, sf).select("source").distinct().count()
    assert(out.length == nSrc)
    out.foreach { r =>
      assert(r.getLong(4) <= r.getLong(1),
        "a 3-gram's source DF cannot exceed the source's doc count")
      assert(r.getLong(3) <= r.getLong(2),
        "boilerplate grams are a subset of distinct grams")
    }
  }

  test("feature_hashed_ngrams: buckets in [0,64), counts consistent") {
    val out = SparkEntry.queries("feature_hashed_ngrams")(spark, sf)
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getLong(1) >= 1 && r.getLong(1) <= 64,
        "nnz must be within the D=64 budget")
      assert(r.getLong(2) >= 0 && r.getLong(2) < 64, "bucket out of range")
      assert(r.getDouble(4) > 0.0)
    }
  }

  test("round-9 keys are deterministic across runs") {
    for (k <- Seq("text_substring_dedup_chars", "text_boilerplate_ngrams",
        "feature_hashed_ngrams")) {
      val a = SparkEntry.queries(k)(spark, sf).collect().toSeq
      val b = SparkEntry.queries(k)(spark, sf).collect().toSeq
      assert(a == b, s"$k is not run-to-run deterministic")
    }
  }
}
