package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc per-query timing probe (not part of the engine): times each named
  * query twice (cold + warm) at the given SF dir. Usage:
  * `runMain graft.JudgeProbe [sfDir] [queryName...]` */
object JudgeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names =
      if (args.length > 1) args.drop(1).toSeq
      else Seq("q75_neardup_components", "q52_jaccard_prefix_join")
    val spark = SparkUtil.configure(
      SparkSession.builder().master("local[32]"), "32").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1 << 20).selectExpr("sum(id)").collect()
    for (q <- names; i <- 1 to 2) {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      SparkEntry.queries(q)(spark, sfDir).queryExecution.toRdd.count()
      println(f"PROBE $q run$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
