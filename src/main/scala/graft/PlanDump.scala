package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Dev tool: print the formatted physical plan of selected declared
  * queries (the `.explain("formatted")` audit loop — see PLANS.md for
  * the curated output and commentary).
  *
  * Usage: runMain graft.PlanDump <sfDir> <key1,key2,...>
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val keys: Seq[String] =
      if (args.length > 1) args(1).split(",").toSeq
      else Seq("agg_pricing_summary", "join_shuffle_large",
        "join_bucketed_colocated", "sim_cosine_topk", "dedup_minhash_lsh")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    keys.foreach { k =>
      println(s"\n===== $k =====")
      val df = SparkEntry.queries(k)(spark, sfDir)
      println(df.queryExecution.explainString(ExplainMode.fromString("formatted")))
    }
    spark.stop()
  }
}
