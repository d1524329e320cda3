package graft

import org.apache.spark.sql.functions._
import graft.streaming.Streaming

/** Streaming batch-equivalence tests (SURVEY §5.3.4): every
  * AvailableNow stream result must equal its batch formulation on the
  * same fixture. */
class StreamingSpec extends GraftSuite {

  test("stream_tumbling_window equals batch window() aggregation") {
    val streamed = Streaming.queries("stream_tumbling_window")(spark, sf)
    val batch = Tables.events(spark, sf)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .count()
      .select(col("window.start").as("ws"), col("event_type"),
        col("count").as("n"))
    assert(streamed.except(batch).isEmpty && batch.except(streamed).isEmpty)
  }

  test("stream_watermark_dedup preserves all distinct event ids") {
    val n = Streaming.queries("stream_watermark_dedup")(spark, sf)
      .agg(sum("n")).collect()(0).getLong(0)
    val expected = Tables.events(spark, sf)
      .select(countDistinct("event_id")).collect()(0).getLong(0)
    assert(n == expected)
  }

  test("stream_stateful_counter final state equals batch group count") {
    val streamed = Streaming.queries("stream_stateful_counter")(spark, sf)
    val batch = Tables.events(spark, sf)
      .filter(col("user_id") % 10 === 0)
      .groupBy("user_id").agg(count(lit(1)).as("n"))
    assert(streamed.except(batch).isEmpty && batch.except(streamed).isEmpty)
  }

  test("stream_foreachbatch_stage stages exactly the batch pipeline output") {
    val staged = Streaming.queries("stream_foreachbatch_stage")(spark, sf)
    val batch = Tables.events(spark, sf)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        round(sum(col("value").cast("decimal(18,2)")).cast("double"), 4)
          .as("total"),
        countDistinct(to_date(col("ts"))).as("n_days"))
    assert(staged.except(batch).isEmpty && batch.except(staged).isEmpty)
  }

  test("stream_multi_microbatch_stage runs >1 micro-batch and equals batch totals") {
    // replicate the declared query's stream but count the batches, to
    // prove maxFilesPerTrigger=1 really drove incremental processing
    import org.apache.spark.sql.streaming.Trigger
    val src = graft.sources.Staging.tmpDir("mb_spec_src")
    Tables.events(spark, sf).repartition(4)
      .write.mode("overwrite").parquet(src)
    val batches = new java.util.concurrent.atomic.AtomicInteger(0)
    val schema = spark.read.parquet(src).schema
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(src)
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        if (!b.isEmpty) batches.incrementAndGet(); ()
      }
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(batches.get() >= 2, s"expected >1 micro-batch, got ${batches.get()}")

    val staged = Streaming.queries("stream_multi_microbatch_stage")(spark, sf)
    val batch = Tables.events(spark, sf)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        round(sum(col("value").cast("decimal(18,2)")).cast("double"), 4)
          .as("total"))
    assert(staged.except(batch).isEmpty && batch.except(staged).isEmpty)
  }

  test("dropDuplicatesWithinWatermark evicts state past the horizon; " +
      "dropDuplicates never does") {
    // batch 1: id=1 @ t0 and id=2 @ t0+3h → watermark after the batch
    // is t0+2h, past id=1's 1h retention → its dedup state is evicted.
    // batch 2: id=1 again @ t0+2.5h (on-time). WithinWatermark lets
    // the reappearance THROUGH (state gone); plain dropDuplicates
    // still remembers id=1 forever and drops it.
    import java.sql.Timestamp
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    def ts(minutes: Long) =
      new Timestamp(1704067200000L + minutes * 60000L) // 2024-01-01 UTC
    def run(within: Boolean): Long = {
      implicit val sqlCtx = spark.sqlContext
      import spark.implicits._
      val in = MemoryStream[(Long, Timestamp)]
      val base = in.toDF.toDF("event_id", "ts").withWatermark("ts", "1 hour")
      val deduped = if (within) base.dropDuplicatesWithinWatermark("event_id")
        else base.dropDuplicates("event_id")
      val name = s"wm_evict_$within"
      val q = deduped.writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        in.addData((1L, ts(0)), (2L, ts(180)))
        q.processAllAvailable()
        in.addData((1L, ts(150)))
        q.processAllAvailable()
        spark.table(name).count()
      } finally q.stop()
    }
    assert(run(within = true) == 3L,
      "evicted id must be re-emitted by dropDuplicatesWithinWatermark")
    assert(run(within = false) == 2L,
      "dropDuplicates keeps id state forever")
  }

  test("stream_update_running_counts: one history row per touching batch, " +
      "final row equals the batch total") {
    val hist = Streaming.queries("stream_update_running_counts")(spark, sf)
      .cache()
    val e = Tables.events(spark, sf).filter(col("user_id") % 10 === 0)
      .select("user_id", "event_id")
    // users with events in both parity halves update twice → 2 rows;
    // single-half users update once → 1 row
    val expected = e.groupBy("user_id")
      .agg(sum(when(col("event_id") % 2 === 0, 1).otherwise(0)).as("na"),
        count(lit(1)).as("nt"))
      .select(col("user_id"),
        when(col("na") > 0 && col("na") < col("nt"), 2L).otherwise(1L)
          .as("k"))
    val rowsPerUser = hist.groupBy("user_id").agg(count(lit(1)).as("k"))
    assert(rowsPerUser.except(expected).isEmpty &&
      expected.except(rowsPerUser).isEmpty)
    // the last update per user is the full running count
    val finals = hist.groupBy("user_id").agg(max("n").as("n"))
    val totals = e.groupBy("user_id").agg(count(lit(1)).as("n"))
    assert(finals.except(totals).isEmpty && totals.except(finals).isEmpty)
    hist.unpersist()
  }

  test("stream_late_data_drop: 2 micro-batches, no below-mid window leaks, " +
      "result equals the batch formulation") {
    import org.apache.spark.sql.streaming.Trigger
    val result = Streaming.queries("stream_late_data_drop")(spark, sf)
      .cache()
    // batch formulation of the declared subset: recent-half rows,
    // windows starting strictly after mid and closed by hi − 30 min
    val e = Tables.events(spark, sf)
      .select(col("ts"), unix_micros(col("ts")).as("us"))
    val mm = e.agg(min(col("us")), max(col("us"))).head
    val (lo, hi) = (mm.getLong(0), mm.getLong(1))
    val mid = (lo + hi) / 2
    val expected = e.filter(col("us") > mid)
      .groupBy(date_trunc("hour", col("ts")).as("ws"))
      .agg(count(lit(1)).as("n"))
      .filter(unix_micros(col("ws")) > mid &&
        unix_micros(col("ws")) + 3600000000L <= hi - 1800000000L)
    assert(result.count() > 0)
    assert(result.except(expected).isEmpty && expected.except(result).isEmpty)
    // no window at or below the midpoint may leak through the filter
    // (an old-half row's hour-window always starts <= its ts <= mid)
    assert(result.filter(unix_micros(col("ws")) <= mid).isEmpty)
    // the declared query left its two-file source behind at a fixed
    // scratch path — re-stream it to prove maxFilesPerTrigger=1 really
    // split the halves into 2 micro-batches (recent first: batch 1's
    // file has the older mod-time by construction)
    val src = graft.sources.Staging.scratchPath("late_src")
    val batches = new java.util.concurrent.atomic.AtomicInteger(0)
    val schema = spark.read.parquet(src).schema
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(src)
      .writeStream
      .foreachBatch { (_: org.apache.spark.sql.DataFrame, _: Long) =>
        batches.incrementAndGet(); ()
      }
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(batches.get() == 2, "two files must drive two micro-batches")
    result.unpersist()
  }

  test("stream_checkpoint_restart resumes past committed offsets " +
      "(exactly-once across the restart)") {
    val out = graft.streaming.Streaming
      .queries("stream_checkpoint_restart")(spark, sf)
    // exactly-once: the appended sink must hold every event once —
    // a recovery replay of run 1's file would double half the counts
    assert(out.agg(org.apache.spark.sql.functions.sum("n"))
      .collect()(0).getLong(0) == Tables.events(spark, sf).count())
    // the second run committed new offsets into the SAME checkpoint
    val ck = graft.sources.Staging.scratchPath("ckpt_meta")
    val offsets = new java.io.File(s"$ck/offsets").listFiles()
    assert(offsets != null && offsets.length >= 2,
      "restart must append an offset epoch to the shared checkpoint")
  }

  test("stream_chunk_ingest census equals the batch chunker's") {
    import org.apache.spark.sql.functions._
    val got = graft.streaming.Streaming
      .queries("stream_chunk_ingest")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    val exp = Tables.documents(spark, sf)
      .select(col("lang"), col("text"), length(col("text")).as("len"))
      .select(col("lang"), col("text"), explode(expr(
        """transform(sequence(0L, (greatest(len - 120, 0) + 79) div 80),
             i -> cast(i * 80 + 1 as int))""")).as("p"))
      .select(col("lang"), expr("substring(text, p, 120)").as("chunk"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n"),
        sum(size(split(col("chunk"), " ")).cast("long")).as("t"),
        sum(length(col("chunk")).cast("long")).as("c"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(got == exp,
      s"streaming census diverges from the batch chunker: $got vs $exp")
  }

  test("stream_ann_index_maintain: >=2 micro-batches merged, " +
    "incremental df == full recompute, top-10 equals batch mirror") {
    import org.apache.spark.sql.functions._
    val got = graft.streaming.Streaming
      .queries("stream_ann_index_maintain")(spark, sf).collect()
    assert(got.length == 10)
    got.foreach { r =>
      assert(r.getBoolean(6),
        s"dim ${r.getLong(1)}: incremental df ${r.getLong(2)} != " +
          s"full recompute ${r.getLong(3)}")
      assert(r.getLong(2) == r.getLong(3))
    }
    // the versioned stats dir proves the read-modify-write merge path
    // ran across >=2 real micro-batches (batch 0 seeds, batch 1 merges)
    val versions = new java.io.File(
      graft.sources.Staging.scratchPath("annstats"))
      .listFiles().map(_.getName).filter(_.startsWith("v")).sorted
    assert(versions.length >= 2,
      s"expected >=2 stats versions (one per micro-batch), got " +
        s"${versions.mkString(",")}")
    // batch mirror of the top-10 df census over the same corpus
    val exp = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"), length(col("text")).as("len"))
      .select(col("doc_id"), col("text"), explode(expr(
        """transform(sequence(0L, (greatest(len - 120, 0) + 79) div 80),
             i -> named_struct('i', i, 'p', cast(i * 80 + 1 as int)))"""
      )).as("c"))
      .select(concat(col("doc_id").cast("string"), lit("#"),
          col("c.i").cast("string")).as("cid"),
        expr("substring(text, c.p, 120)").as("chunk"))
      .select(col("cid"), explode(split(col("chunk"), " ")).as("w"))
      .select(col("cid"),
        expr("CAST(conv(substring(md5(w), 1, 2), 16, 10) AS BIGINT)")
          .as("dim"))
      .distinct()
      .groupBy("dim").agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("dim")).limit(10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got.map(r => (r.getLong(1), r.getLong(2))).toSeq == exp,
      "streaming-maintained df census diverges from the batch mirror")
  }
}
