package graft

import org.apache.spark.sql.SparkSession

/** Plan-shape audit CLI: for each named key, print the executed
  * plan's join mix, exchange count, and codegen spans — the
  * `.explain("formatted")` discipline as a one-liner. Usage:
  * `runMain graft.ExplainAudit <key> [<key> …]` (sf0.01 fixtures).
  * BroadcastNestedLoopJoin hits are only acceptable against declared
  * 1-row censuses / bounded probe batches — anything else is a
  * scale bug (see PlanShapeSpec for the pinned invariants).
  */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.01"
    for (k <- args) {
      val df = SparkEntry.queries(k)(spark, sf)
      df.collect()
      // AQE's toString echoes "== Initial Plan ==" after the final
      // plan — split it off or every count doubles (r13 fix); codegen
      // spans render as "*(n)" stage prefixes in the final plan, not
      // as "WholeStageCodegen" lines.
      val plan = df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      val joins = "(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|BroadcastNestedLoopJoin|CartesianProduct)".r
        .findAllIn(plan).toSeq.groupBy(identity).map { case (a, b) => s"$a x${b.size}" }
      val exch = "Exchange (hash|range|Single)".r.findAllIn(plan).size
      val spans = "\\*\\((\\d+)\\)".r.findAllMatchIn(plan)
        .map(_.group(1).toInt).toSet.size
      println(s"== $k: joins=${joins.mkString(",")} exchanges=$exch " +
        s"codegen_spans=$spans")
    }
    spark.stop()
  }
}
