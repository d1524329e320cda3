package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch diagnostic for stream_late_data_drop — DELETE before commit. */
object DebugLate {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.01"
    val scratch = graft.sources.Staging.tmpDir("late_scratch")
    val src = graft.sources.Staging.tmpDir("late_src")
    val e = Tables.events(spark, d).select(col("event_id"), col("ts"),
      unix_micros(col("ts")).as("us"))
    val mm = e.agg(min(col("us")), max(col("us"))).head
    val mid = (mm.getLong(0) + mm.getLong(1)) / 2
    e.filter(col("us") > mid).select("event_id", "ts")
      .coalesce(1).write.mode("overwrite").parquet(s"$scratch/recent")
    e.filter(col("us") <= mid).select("event_id", "ts")
      .coalesce(1).write.mode("overwrite").parquet(s"$scratch/old")
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    def placeAs(fromDir: String, name: String, mtime: Long): Unit = {
      val part = fs.listStatus(new Path(fromDir))
        .map(_.getPath).filter(_.getName.endsWith(".parquet")).head
      val dest = new Path(src, name)
      org.apache.hadoop.fs.FileUtil.copy(fs, part, fs, dest, false, true,
        spark.sparkContext.hadoopConfiguration)
      fs.setTimes(dest, mtime, -1)
    }
    val t0 = 1600000000000L
    placeAs(s"$scratch/recent", "00_recent.parquet", t0)
    placeAs(s"$scratch/old", "01_late.parquet", t0 + 60000)
    fs.listStatus(new Path(src)).foreach { st =>
      println(s"[debug] file=${st.getPath.getName} mtime=${st.getModificationTime} len=${st.getLen}")
    }
    val schema = spark.read.parquet(src).schema
    val sdf = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(src)
      .withWatermark("ts", "30 minutes")
      .groupBy(window(col("ts"), "1 hour")).count()
    val q = sdf.writeStream.format("memory").queryName("dbg")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    q.recentProgress.foreach { p =>
      println(s"[debug] batch=${p.batchId} rows=${p.numInputRows} wm=${p.eventTime.get("watermark")} maxET=${p.eventTime.get("max")} dropped=${Option(p.stateOperators).map(_.map(_.numRowsDroppedByWatermark).sum)}")
    }
    println(s"[debug] sink rows=${spark.table("dbg").count()}")
    spark.stop()
  }
}
