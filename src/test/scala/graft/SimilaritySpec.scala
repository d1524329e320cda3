package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Property tests for the similarity block — these are the "done"
  * criteria for the no-oracle key sim_lsh_ann (SURVEY §5.3.3). */
class SimilaritySpec extends GraftSuite {

  test("sim_cosine_topk: self-similarity excluded, cos in [-1,1], 3 per query") {
    val rows = Similarity.queries("sim_cosine_topk")(spark, sf).collect()
    assert(rows.length == 15) // 5 query vectors × top-3
    assert(rows.forall(r => r.getLong(0) != r.getLong(2)))
    assert(rows.forall(r => math.abs(r.getDouble(3)) <= 1.0))
  }

  test("sim_lsh_ann: deterministic under fixed seed") {
    val a = Similarity.queries("sim_lsh_ann")(spark, sf).collect()(0)
    val b = Similarity.queries("sim_lsh_ann")(spark, sf).collect()(0)
    assert(a == b)
  }

  test("sim_matryoshka_truncate: 3 refined hits per query, ranked by full cosine") {
    val rows = Similarity.queries("sim_matryoshka_truncate")(spark, sf).collect()
    assert(rows.length == 15) // 5 queries × top-3
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val byRank = rs.sortBy(_.getInt(1))
      // final ranking is by the FULL-width cosine, descending
      val cs = byRank.map(_.getDouble(3))
      assert(cs.sliding(2).forall { case Array(a, b) => a >= b; case _ => true })
      rs.foreach { r =>
        assert(math.abs(r.getDouble(3)) <= 1.0) // cos
        assert(math.abs(r.getDouble(4)) <= 1.0) // cos16
        assert(r.getLong(0) != r.getLong(2), "self-match leaked")
      }
    }
  }

  test("sim_ann_recall_eval: full truth denominator, recall consistent") {
    val rows = Similarity.queries("sim_ann_recall_eval")(spark, sf).collect()
    assert(rows.length == 5) // one row per query vector
    rows.foreach { r =>
      val (nTrue, nHit, recall) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(nTrue == 10, s"truth set must be top-10, got $nTrue")
      assert(nHit >= 0 && nHit <= nTrue)
      assert(recall == nHit.toDouble / nTrue)
    }
    // the 20×6 LSH geometry targets ~0.74 mean recall on near-random
    // fixtures — a collapse below 0.3 means the candidate generator broke
    val mean = rows.map(_.getDouble(3)).sum / rows.length
    assert(mean >= 0.3, s"mean recall@10 collapsed: $mean")
  }

  test("sim_lsh_ann: recall ≥ 0.5 vs brute-force nearest neighbor") {
    // Brute-force 1-NN by cosine for each of 20 probe vectors; the
    // LSH candidate set (the exact pair set the declared query
    // aggregates) must recover at least half of the true NN pairs —
    // the 20-table OR-amplified geometry holds this even on the
    // fixture's near-random vectors (see the LSH geometry note in
    // Similarity).
    graft.functions.GraftFunctions.register(spark)
    val e = Tables.embeddings(spark, sf).select(col("vec_id"), col("embedding"))
    val probes = e.select(col("vec_id").as("q"), col("embedding").as("qe"))
      .filter(col("q") < 20)
    val truePairs = probes.crossJoin(e)
      .filter(col("q") =!= col("vec_id"))
      .withColumn("cos", expr("cosine_sim(qe, embedding)"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("q").orderBy(col("cos").desc, col("vec_id"))))
      .filter(col("rn") === 1)
      .select(col("q"), col("vec_id").as("nn"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truePairs.nonEmpty)
    val found = graft.operators.MirroredLsh.candidates(e)
      .select(col("a"), col("b"))
      .collect().flatMap(r => Seq((r.getLong(0), r.getLong(1)),
                                  (r.getLong(1), r.getLong(0)))).toSet
    val recall = truePairs.count(found).toDouble / truePairs.size
    assert(recall >= 0.5, s"LSH recall $recall < 0.5 (${truePairs.size} true pairs)")
  }

  test("sim_ivf_ann: recall ≥ 0.3 vs brute-force cosine top-3") {
    // IVF with nprobe=2 of 16 cells; brute force = sim_cosine_topk.
    val truth = Similarity.queries("sim_cosine_topk")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val ivf = Similarity.queries("sim_ivf_ann")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(ivf.nonEmpty, "IVF returned no neighbors")
    val recall = truth.count(ivf).toDouble / truth.size
    assert(recall >= 0.3, s"IVF recall $recall < 0.3")
  }

  test("udaf_typed centroid matches built-in per-dim average") {
    val rows = Similarity.queries("udaf_typed")(spark, sf).collect()
    assert(rows.length == 10) // labels 0..9
    // cross-check c0 against the built-in formulation
    val expected = Tables.embeddings(spark, sf)
      .select(col("label"), element_at(col("embedding"), 1).cast("double").as("x"))
      .groupBy("label").agg(round(avg(col("x")), 4).as("c0"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    rows.foreach { r =>
      assert(math.abs(r.getDouble(2) - expected(r.getInt(0))) <= 1e-4)
    }
  }

  test("sim_mmr_diversify: exactly matches a driver-side greedy " +
    "mirror and is more diverse than plain top-5") {
    import org.apache.spark.sql.functions.col
    val out = SparkEntry.queries("sim_mmr_diversify")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val vecs = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    def q4(x: Double): Double = math.floor(x * 10000.0) / 10000
    (0L until 5L).foreach { qid =>
      val rel = vecs.keys.filter(_ != qid).map(c =>
        c -> q4(cos(vecs(qid), vecs(c)))).toSeq
      val cand = rel.sortBy { case (c, r) => (-r, c) }.take(20)
      val relM = cand.toMap
      var sel = Vector(cand.head._1)
      (2 to 5).foreach { _ =>
        val pick = cand.map(_._1).filterNot(sel.contains).map { c =>
          val msim = sel.map(sv => q4(cos(vecs(c), vecs(sv)))).max
          c -> q4(0.7 * relM(c) - 0.3 * msim)
        }.minBy { case (c, s) => (-s, c) }._1
        sel :+= pick
      }
      val got = out.filter(_._1 == qid).sortBy(_._2).map(_._3)
      assert(got.toSeq == sel,
        s"probe $qid: engine picks ${got.toSeq} != mirror $sel")
      // diversity: MMR's max intra-set sim <= plain top-5's
      def maxSim(set: Seq[Long]): Double = (for {
        a <- set; b <- set if a < b
      } yield cos(vecs(a), vecs(b))).max
      val top5 = cand.take(5).map(_._1)
      assert(maxSim(sel) <= maxSim(top5) + 1e-9,
        s"probe $qid: MMR set is not more diverse than plain top-5")
    }
  }

  test("sim_binary_hamming_topk: exactly matches a driver-side " +
      "sign-code + hamming-rank mirror") {
    val out = Similarity.queries("sim_binary_hamming_topk")(spark, sf)
      .collect().map(r =>
        (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(out.length == 15) // 5 probes × top-3
    val vecs = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .toMap
    def code(v: Array[Double]): Array[Boolean] = v.map(_ > 0d)
    def ham(a: Array[Boolean], b: Array[Boolean]): Long =
      a.zip(b).count { case (x, y) => x != y }.toLong
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    (0L to 4L).foreach { qid =>
      val qc = code(vecs(qid))
      val want = vecs.keys.filter(_ != qid).toSeq
        .map(c => (c, ham(qc, code(vecs(c)))))
        .sortBy { case (c, h) => (h, c) }.take(3)
      val got = out.filter(_._1 == qid).sortBy(_._2)
      assert(got.map(g => (g._3, g._4)).toSeq == want,
        s"probe $qid: engine ${got.toSeq} != mirror $want")
      // the cos column is the EXACT full-width cosine of the selected
      // pair (the two-stage contract: scan on codes, re-score exact)
      got.foreach { g =>
        assert(math.abs(g._5 - cos(vecs(qid), vecs(g._3))) <= 5e-5)
      }
    }
  }
}
