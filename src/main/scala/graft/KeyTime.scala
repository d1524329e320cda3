package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: time selected declared queries N times in ONE session —
  * separates first-run init (codegen, broadcast-exchange, checkpoint
  * dir, state-store) from the warm per-key cost that Bench anchors
  * should reflect.
  *
  * Usage: runMain graft.KeyTime <sfDir> <key1,key2,...> [reps]
  */
object KeyTime {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val keys: Seq[String] =
      if (args.length > 1) args(1).split(",").toSeq else Seq("agg_pricing_summary")
    val reps = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    keys.foreach { k =>
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(k)(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$k%-32s ${ts.map(t => f"$t%.2f").mkString("  ")}  (min ${ts.min}%.2f s)")
    }
    spark.stop()
  }
}
