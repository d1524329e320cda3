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
}
