package graft

import org.apache.spark.sql.SparkSession

/** Dev tool (r15): board-wide static plan census — per key, the
  * number of parquet scans, exchanges and join operators in the
  * physical plan of the RETURNED frame (eager keys run their
  * interior during construction; the census still covers their
  * final stage). High scan counts flag duplicated subtrees that
  * exchange reuse did not dedupe (the graph_pagerank disease).
  *
  * Usage: runMain graft.PlanStats <sfDir> [minScans]
  */
object PlanStats {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val minScans = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (k, fn) =>
      try {
        val df = fn(spark, sfDir)
        val plan = df.queryExecution.executedPlan.toString
          .split("== Initial Plan ==").head
        val scans = "Scan parquet".r.findAllIn(plan).size
        val exch = "Exchange".r.findAllIn(plan).size
        val joins = "Join".r.findAllIn(plan).size
        if (scans >= minScans)
          println(f"PLANSTATS $k%-36s scans=$scans%3d exch=$exch%3d joins=$joins%3d")
      } catch { case e: Throwable =>
        println(s"PLANSTATS $k ERROR ${e.getMessage.take(80)}")
      }
    }
    spark.stop()
  }
}
