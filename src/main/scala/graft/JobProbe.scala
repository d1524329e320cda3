package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev tool (r15 optimization round): structural cost breakdown of
  * declared keys — jobs, stages, tasks, summed task time and shuffle
  * bytes. Wall-clock on this sandbox swings ±30% run-to-run, so the
  * optimization loop compares THESE (stable) counters plus summed task
  * time instead (guide §1: measure first, §2: shuffle bytes are the
  * currency).
  *
  * Usage: runMain graft.JobProbe <sfDir> <key1,key2,...> [cpus]
  */
object JobProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val keys = args(1).split(",").toSeq
    val cpus = if (args.length > 2) args(2) else "32"
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0L
    @volatile var taskMs = 0L
    @volatile var shufR = 0L
    @volatile var shufW = 0L
    val stageDetail = sys.env.get("GRAFT_PROBE_STAGES").contains("1")
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = jobs += 1
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        stages += 1
        tasks += sc.stageInfo.numTasks
        val m = sc.stageInfo.taskMetrics
        taskMs += m.executorRunTime
        shufR += m.shuffleReadMetrics.totalBytesRead
        shufW += m.shuffleWriteMetrics.bytesWritten
        if (stageDetail && m.executorRunTime > 200)
          println(f"  stage ${sc.stageInfo.stageId}%4d tasks=${sc.stageInfo.numTasks}%3d task_s=${m.executorRunTime / 1000.0}%8.2f rows_out=${m.outputMetrics.recordsWritten}%8d shufR=${m.shuffleReadMetrics.recordsRead}%10d shufW=${m.shuffleWriteMetrics.recordsWritten}%10d  ${sc.stageInfo.name.take(60)}")
      }
    })
    // warm-up mirroring Bench's session floor
    spark.range(1000000L).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    println(f"${"key"}%-28s ${"wall_s"}%8s ${"jobs"}%5s ${"stages"}%7s ${"tasks"}%6s ${"task_s"}%8s ${"shufMB"}%8s")
    keys.foreach { key =>
      jobs = 0; stages = 0; tasks = 0L; taskMs = 0L; shufR = 0L; shufW = 0L
      val t0 = System.nanoTime()
      SparkEntry.queries(key)(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(400)
      // storage census (r15 #5): persistent-RDD count and resident
      // block bytes AFTER the key — the cross-key pressure a dead
      // interior checkpoint leaves behind
      val rddInfos = spark.sparkContext.getRDDStorageInfo
      val storMb = rddInfos.map(i => i.memSize + i.diskSize).sum / 1e6
      println(f"$key%-28s $wall%8.2f $jobs%5d $stages%7d $tasks%6d ${taskMs / 1000.0}%8.2f ${(shufR + shufW) / 1e6}%8.2f  rdds=${spark.sparkContext.getPersistentRDDs.size}%4d stored=$storMb%8.2f MB")
    }
    spark.stop()
  }
}
