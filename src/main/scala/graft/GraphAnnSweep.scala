package graft

import org.apache.spark.sql.SparkSession

/** Graph-ANN entry-layer sweep (r13, VERDICT r12 #8) — the M×T
  * precedent applied to the ENTRY question: does a hierarchical
  * coarse layer (score every `stride`-th node per query, seed the
  * beam from its top-nEnt — the HNSW upper-layer idea) buy fewer
  * beam rounds R for the same recall than the shipped flat 8-entry
  * spine? Measures mean recall@10 (exact truth) + wall per geometry
  * on the real fixtures via Similarity3.recallGeo. Results recorded
  * in PLANS.md; the shipped geometry changes ONLY if a hierarchical
  * row dominates flat on both recall and cost.
  *
  * Usage: sbt "runMain graft.GraphAnnSweep <sfDir> [stride,nEnt,R;…]"
  *        (stride ≤ 0 = flat spine; nEnt ignored for flat)
  */
object GraphAnnSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val geos: Seq[(Int, Int, Int)] =
      if (args.length > 1) args(1).split(";").toSeq.map { g =>
        val Array(st, ne, r) = g.split(",").map(_.trim.toInt); (st, ne, r)
      }
      else Seq(
        (0, 8, 5),   // shipped: flat 8-entry spine, R=5
        (0, 8, 4), (0, 8, 3),
        (64, 4, 4), (64, 4, 3), (64, 4, 2),
        (64, 8, 3), (32, 4, 3), (128, 4, 3))
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for ((st, ne, r) <- geos) {
      val t0 = System.nanoTime()
      val rows = operators.Similarity3.recallGeo(spark, sfDir, st, ne, r)
        .collect()
      val mean = rows.map(_.getDouble(3)).sum / rows.length
      val sec = (System.nanoTime() - t0) / 1e9
      val kind = if (st <= 0) "flat" else s"hier(stride=$st,nEnt=$ne)"
      println(f"ANNSWEEP $kind%-24s R=$r meanRecall10=$mean%.3f " +
        f"time=$sec%5.1fs")
    }
    spark.stop()
  }
}
