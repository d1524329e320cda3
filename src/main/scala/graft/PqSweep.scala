package graft

import org.apache.spark.sql.SparkSession

/** PQ geometry sweep harness (r9) — the quantized-family twin of the
  * r7 LSH band sweep: measure mean recall@10 of the EXACT declared
  * ADC scoring path (Similarity2.pqRecall) across candidate
  * M (subspaces) × K (codewords) × Lloyd-round budgets, on the real
  * fixtures. This is how the shipped PqM/PqK/PqRounds constants were
  * chosen; results are recorded in PLANS.md.
  *
  * Usage: sbt "runMain graft.PqSweep <sfDir> [M,K,rounds;M,K,rounds;…]"
  */
object PqSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val geos: Seq[(Int, Int, Int)] =
      if (args.length > 1) args(1).split(";").toSeq.map { g =>
        val Array(m, k, r) = g.split(",").map(_.trim.toInt); (m, k, r)
      }
      else Seq((4, 8, 1), (4, 8, 2), (8, 16, 1), (8, 16, 2),
        (8, 32, 1), (8, 32, 2), (16, 16, 1), (16, 32, 2))
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val annOnly = args.length > 2 && args(2) == "ann"
    for ((m, k, r) <- geos) {
      val t0 = System.nanoTime()
      val stat =
        if (annOnly) {
          // declared sim_pq_ann shape: fit + codes + ADC top-k, no
          // exact-truth leg — the number the bench anchor sees
          val (emb, adc) = operators.Similarity2.pqAdcGeo(spark, sfDir, m, k, r)
          val n = adc.count(); emb.unpersist()
          f"adcRows=$n%d"
        } else {
          val rows = operators.Similarity2.pqRecall(spark, sfDir, m, k, r)
            .collect()
          val mean = rows.map(_.getDouble(2)).sum / rows.length
          f"meanRecall10=$mean%.3f"
        }
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"PQSWEEP M=$m%2d K=$k%3d rounds=$r bits=${
        m * (math.log(k) / math.log(2)).round}%3d " +
        f"$stat time=$sec%5.1fs")
    }
    spark.stop()
  }
}
