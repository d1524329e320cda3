package graft
import org.apache.spark.sql.SparkSession
object TaskCost {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    for (n <- Seq(32, 320, 3200)) {
      val t0=System.nanoTime()
      spark.sparkContext.parallelize(1 to n, n).map(_ => 1).reduce(_+_)
      println(f"rdd   n=$n%5d  ${(System.nanoTime()-t0)/1e9}%7.3f s")
    }
    for (n <- Seq(32, 320, 3200)) {
      val t0=System.nanoTime()
      spark.range(n.toLong).repartition(n).selectExpr("count(*)").collect()
      println(f"sql   n=$n%5d  ${(System.nanoTime()-t0)/1e9}%7.3f s")
    }
    spark.stop()
  }
}
