package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Every query must plan AND execute against empty input tables — at
  * cluster scale empty partitions, empty shards, and day-one empty
  * corpora are routine, and an operator that throws on zero rows (head()
  * on an empty frame, a div-by-zero literal, a window over nothing) is a
  * production incident. The full inventory runs here against zero-row
  * copies of all ten tables. */
class EmptyInputSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var dst: String = _

  override def beforeAll(): Unit = {
    spark = graft.SparkUtil.configure(
      SparkSession.builder().master("local[4]"), "4").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    dst = java.nio.file.Files.createTempDirectory("graft-empty").toString
    val src = "/root/testdata/sf0.001"
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
                  "orders", "lineitem", "events", "documents", "embeddings")) {
      spark.read.parquet(s"$src/$t.parquet").limit(0)
        .write.mode("overwrite").parquet(s"$dst/$t.parquet")
    }
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("all queries execute on zero-row tables without throwing") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try { fn(spark, dst).queryExecution.toRdd.count(); None }
      catch { case e: Throwable => Some(s"$name: ${e.getClass.getSimpleName}") }
    }
    assert(failures.isEmpty, failures.mkString("; "))
  }
}
