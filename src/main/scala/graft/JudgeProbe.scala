package graft

import org.apache.spark.sql.SparkSession

// temporary judge probe — times individual queries, not part of the engine
object JudgeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = SparkUtil.configure(
      SparkSession.builder().master("local[32]"), "32").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1 << 20).selectExpr("sum(id)").collect()
    for (q <- Seq("q75_neardup_components", "q72_quantiles"); i <- 1 to 2) {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      SparkEntry.queries(q)(spark, sfDir).queryExecution.toRdd.count()
      println(f"JUDGE $q run$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
