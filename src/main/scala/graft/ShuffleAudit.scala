package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Shuffle-volume audit (r13) — measured evidence for the SURVEY's
  * central 100 TB claim: the near-dup/text/similarity keys shuffle
  * HASHES AND SIGNATURES, never document payloads. For each audited
  * key the harness runs the declared plan to completion under a
  * stage-metrics listener and reports bytes READ from parquet vs
  * bytes WRITTEN to shuffle, alongside the corpus' raw text volume —
  * at any scale, a key whose shuffle grows with the text (not the
  * fingerprints) would be unrunnable at 100 TB, and this is the
  * number that proves each one doesn't. Results recorded in PLANS.md
  * (the ScaleSmoke precedent: harness + recorded table, re-run per
  * round when the audited keys change).
  *
  * Listener note: stage-completed events post asynchronously; the
  * counters are AtomicLongs (lost listener-thread updates would
  * under-count) and the harness quiesces by polling until the
  * per-key accumulators stop moving across THREE consecutive 300 ms
  * reads (ADVICE r13: one stable poll could race a straggler
  * stage-completed event from the previous key into the next key's
  * window) — still an audit of MB-scale magnitudes, not a bit-exact
  * meter.
  *
  * Usage: sbt "runMain graft.ShuffleAudit <sfDir> [key1,key2,…]"
  */
object ShuffleAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val keys: Seq[String] =
      if (args.length > 1) args(1).split(",").toSeq.map(_.trim)
      else Seq(
        // near-dup family: only signatures/bands may shuffle
        "dedup_minhash_lsh", "dedup_simhash", "dedup_ngram_jaccard",
        "text_substring_dedup_chars", "multimodal_phash",
        // retrieval/similarity: postings + codes, never vectors>needed
        "sim_lsh_ann", "text_bm25_retrieval",
        // token-frame keys: hashes and counts, never raw text
        "text_tokenize_wordcount", "text_bpe_train_rounds",
        // control: a key that MUST shuffle its payload (exact dedup
        // groups on the full content hash + row) for scale context
        "dedup_exact")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val inputB = new java.util.concurrent.atomic.AtomicLong(0L)
    val shufWB = new java.util.concurrent.atomic.AtomicLong(0L)
    val listener = new SparkListener {
      override def onStageCompleted(
          sc: SparkListenerStageCompleted): Unit = {
        val tm = sc.stageInfo.taskMetrics
        if (tm != null) {
          inputB.addAndGet(tm.inputMetrics.bytesRead)
          shufWB.addAndGet(tm.shuffleWriteMetrics.bytesWritten)
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)

    val textBytes = Tables.documents(spark, sfDir)
      .agg(sum(length(col("text")))).collect()(0).getLong(0)
    val mb = 1024.0 * 1024.0
    println(f"corpus text bytes: ${textBytes / mb}%8.2f MB  ($sfDir)")

    // stable = three consecutive identical reads, so one quiet poll
    // window can't mask a straggler event between two moving reads
    def quiesce(): Unit = {
      var stable = 0
      var prev = (inputB.get(), shufWB.get())
      while (stable < 3) {
        Thread.sleep(300)
        val cur = (inputB.get(), shufWB.get())
        if (cur == prev) stable += 1 else { stable = 0; prev = cur }
      }
    }
    // warm-up (session init costs would pollute the first key)
    spark.range(1000000L).selectExpr("sum(id)").collect()
    quiesce()

    for (k <- keys) {
      inputB.set(0L); shufWB.set(0L)
      val t0 = System.nanoTime()
      SparkEntry.queries(k)(spark, sfDir).foreach(_ => ())
      quiesce()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"SHUFAUDIT $k%-28s read=${inputB.get() / mb}%8.2f MB  " +
        f"shufW=${shufWB.get() / mb}%8.2f MB  shuf/text=${
          shufWB.get().toDouble / textBytes}%6.3f  time=$sec%5.1fs")
    }
    spark.stop()
  }
}
