package graft

import org.apache.spark.sql.functions._
import graft.operators.TextModel

/** Cross-checks for the unigram-LM quality scorer: the distributed
  * score must equal a driver-side recomputation from raw token
  * counts, and the score must behave like a surprise measure (rarer
  * tokens → higher score). */
class TextModelSpec extends GraftSuite {

  test("text_unigram_logprob matches a driver-side recomputation") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val counts = scala.collection.mutable.Map.empty[String, Long]
    var total = 0L
    docs.values.foreach(_.split(" ", -1).foreach { w =>
      counts(w) = counts.getOrElse(w, 0L) + 1L; total += 1
    })
    // bounded scoring vocab: top-K by (count DESC, token ASC), OOV
    // floor count 1 — must mirror TextModel.VocabTopK semantics
    val topK = counts.toSeq.sortBy { case (w, c) => (-c, w) }
      .take(TextModel.VocabTopK).toMap
    assert(counts.size > TextModel.VocabTopK,
      "fixture vocab no longer exercises the OOV floor")
    val got = TextModel.queries("text_unigram_logprob")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
    assert(got.nonEmpty)
    got.foreach { case (docId, nTok, nllTok) =>
      val toks = docs(docId).split(" ", -1)
      assert(toks.length.toLong == nTok, s"doc $docId token count")
      val exp = toks.map(w =>
        -math.log(topK.getOrElse(w, 1L).toDouble / total.toDouble))
        .sum / toks.length
      // the engine quantizes per-term to DECIMAL(28,10) then
      // floor-scales — allow the quantization slack
      assert(math.abs(exp - nllTok) < 2e-4,
        s"doc $docId: driver=$exp engine=$nllTok")
    }
  }

  test("scores are positive and non-degenerate across documents") {
    val scores = TextModel.queries("text_unigram_logprob")(spark, sf)
      .collect().map(_.getDouble(3))
    // -ln p with p <= 1 is nonnegative, and real corpora differ
    scores.foreach(v => assert(v > 0))
    assert(scores.distinct.length > 1, "all docs scored identically")
  }

  test("text_bigram_logprob: n_bigrams = tokens - 1, scores nonnegative") {
    import org.apache.spark.sql.functions._
    val got = TextModel.queries("text_bigram_logprob")(spark, sf)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getDouble(3)))).toMap
    val docs = Tables.documents(spark, sf)
      .filter(col("doc_id") % 11 === 0)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got.nonEmpty)
    got.foreach { case (id, (nBigrams, nll)) =>
      val nTok = docs(id).split(" ", -1).length
      assert(nBigrams == nTok - 1, s"doc $id bigram count")
      // P(w2|w1) = cb/cu <= 1 → every term -ln P >= 0; floor-scale can
      // only round down, never below -1e-4
      assert(nll >= -1e-4, s"doc $id negative mean surprise: $nll")
    }
  }

  test("text_kneser_ney_bigram: P(·|w1) is a proper distribution over " +
    "the vocab for every context, scores positive") {
    import org.apache.spark.sql.functions._
    val out = TextModel.queries("text_kneser_ney_bigram")(spark, sf)
      .collect()
    assert(out.nonEmpty)
    out.foreach(r => assert(r.getDouble(3) >= -1e-4,
      s"doc ${r.getLong(0)}: mean -ln P must be >= 0 (P <= 1)"))
    // recompute the fit tables on the driver (fixture corpus is tiny)
    // and check exact normalization: Σ_w2∈V P(w2|w1) = 1 — the
    // property interpolated KN guarantees and Stupid Backoff doesn't.
    val bigs = Tables.documents(spark, sf).select("text").collect()
      .map(_.getString(0).split(" ", -1)).filter(_.length >= 2)
      .flatMap(ws => ws.init.zip(ws.tail))
    val cbM = bigs.groupBy(identity).map { case (k, v) => k -> v.length }
    val cuM = bigs.groupBy(_._1).map { case (k, v) => k -> v.length }
    val n1fM = cbM.keys.toSeq.groupBy(_._1).map { case (k, v) => k -> v.length }
    val n1bM = cbM.keys.toSeq.groupBy(_._2).map { case (k, v) => k -> v.length }
    val bb = cbM.size.toDouble
    val vocab = bigs.map(_._2).distinct
    val d = 0.75
    cuM.keys.take(25).foreach { w1 =>
      val cu = cuM(w1).toDouble
      val lam = d * n1fM(w1) / cu
      val total = vocab.map { w2 =>
        val disc = cbM.get((w1, w2)).map(c => (c - d) / cu).getOrElse(0.0)
        disc + lam * (n1bM.getOrElse(w2, 0) / bb)
      }.sum
      assert(math.abs(total - 1.0) < 1e-9,
        s"context '$w1': KN probabilities sum to $total, not 1")
    }
  }

  test("text_bpe_train_rounds: exactly matches a driver-side BPE " +
    "trainer; merged symbols feed the next round's candidates") {
    val got = TextModel.queries("text_bpe_train_rounds")(spark, sf)
      .collect().map(r =>
        (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val words = Tables.documents(spark, sf)
      .filter(col("doc_id") % 25 === 0)
      .select(explode(split(col("text"), " ")).as("w"))
      .collect().map(_.getString(0)).filter(_.length >= 2)
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    // symbol strings + String.replace — the EXACT engine semantics
    // (left-to-right non-overlapping with separator consumption,
    // identical in Spark/DuckDB/Java; the declared merge semantics)
    var syms: Map[String, Long] =
      words.map { case (w, f) => w.map(_.toString).mkString(" ") -> f }
    def pairCounts: Map[String, Long] =
      syms.toSeq.flatMap { case (sy, f) =>
        val ts = sy.split(" ")
        ts.zip(ts.drop(1)).map { case (a, b) => s"$a $b" -> f }
      }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    def top1: (String, Long) =
      pairCounts.toSeq.minBy { case (p, wt) => (-wt, p) }
    def applyMerge(p: String): Unit =
      syms = syms.toSeq.map { case (sy, f) =>
        (" " + sy + " ").replace(" " + p + " ",
          " " + p.replace(" ", "") + " ").trim -> f
      }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val (p1, w1) = top1; applyMerge(p1)
    val (p2, w2) = top1; applyMerge(p2)
    val rem = pairCounts.toSeq.sortBy { case (p, wt) => (-wt, p) }.take(10)
    val want =
      Seq(("merge1", 1L, p1, w1), ("merge2", 1L, p2, w2)) ++
        rem.zipWithIndex.map { case ((p, wt), i) =>
          ("remaining", i + 1L, p, wt) }
    assert(got.toSeq == want.sortBy(t => (t._1, t._2)),
      s"BPE mismatch: got=${got.take(4).toSeq} want=${want.take(4)}")
    // the merge actually propagated: some later candidate contains a
    // multi-char symbol (e.g. 'm er') — the signature of real BPE
    assert(got.exists(r => r._1 == "remaining" &&
      r._3.split(" ").exists(_.length > 1)),
      "no merged symbol appears in round-3 candidates — merges inert")
  }

  test("text_bigram_generate: exactly matches a driver-side weighted " +
    "md5-interval draw; every step is a real corpus bigram") {
    val got = TextModel.queries("text_bigram_generate")(spark, sf)
      .collect().map(r => (r.getString(0), r.getInt(2), r.getString(1)))
      .toSeq.sortBy(t => (t._1, t._2))
    assert(got.nonEmpty)
    val docs = Tables.documents(spark, sf).select("text")
      .collect().map(_.getString(0).split(" ").toSeq)
    val bigrams = docs.filter(_.length >= 2)
      .flatMap(t => t.zip(t.drop(1)))
      .groupBy(identity _).view.mapValues(_.size.toLong).toMap
    val byCtx = bigrams.toSeq.groupBy(_._1._1).map { case (w1, xs) =>
      // interval order = ORDER BY w2 (the window's declared order)
      val sorted = xs.sortBy(_._1._2)
      val cum = sorted.scanLeft(0L)(_ + _._2).tail
      w1 -> sorted.map(_._1._2).zip(cum.map(h => h) zip
        (0L +: cum.dropRight(1))).map { case (w2, (hi, lo)) => (w2, lo, hi) }
    }
    val uni = docs.flatten.groupBy(identity _).view.mapValues(_.size.toLong)
    val starts = uni.toSeq.sortBy { case (w, c) => (-c, w) }.take(5).map(_._1)
    def u48(key: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
      val hex = d.digest(key.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(12)
      java.lang.Long.parseLong(hex, 16)
    }
    val want = starts.flatMap { s0 =>
      var cur = s0
      (0, s0) +: (1 to 6).map { r =>
        val ranges = byCtx(cur)
        val tot = ranges.last._3
        val coin = u48(s"$s0:$r:$cur") % tot
        cur = ranges.find(x => x._2 <= coin && coin < x._3).get._1
        (r, cur)
      }
    }.zip(starts.flatMap(s0 => Seq.fill(7)(s0)))
      .map { case ((st, tk), s0) => (s0, st, tk) }
      .sortBy(t => (t._1, t._2))
    assert(got == want,
      s"generation mismatch: got=${got.take(8)}… want=${want.take(8)}…")
    // every consecutive pair is a bigram observed in the corpus
    got.groupBy(_._1).foreach { case (_, sq) =>
      sq.sortBy(_._2).map(_._3).sliding(2).foreach {
        case Seq(a, b) => assert(bigrams.contains((a, b)),
          s"generated pair ($a,$b) never occurs in the corpus")
        case _ => ()
      }
    }
  }
}
