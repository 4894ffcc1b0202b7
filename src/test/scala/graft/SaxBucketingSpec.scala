package graft

import graft.sax.SaxFunctions._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The at-rest half of the iSAX scale story: word-bucketed storage makes
  * word equi-joins shuffle-free. This spec proves the plan shape —
  * bucketed self-join has NO Exchange on either side — and that results
  * match the unbucketed join. */
class SaxBucketingSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var warehouse: java.nio.file.Path = _

  override def beforeAll(): Unit = {
    warehouse = java.nio.file.Files.createTempDirectory("graft-warehouse")
    spark = graft.SparkUtil.configure(
        SparkSession.builder().master("local[4]"), "4")
      .config("spark.sql.warehouse.dir", warehouse.toString)
      .config("spark.sql.autoBroadcastJoinThreshold", -1) // force SMJ to expose Exchanges
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("word-bucketed tables join co-located: no Exchange in the plan") {
    import org.apache.spark.sql.expressions.Window
    val trail = Window.partitionBy("user_id")
      .orderBy(expr("ts div 1000"), col("event_id")).rowsBetween(-7, 0)
    val words = spark.read
      .parquet("/root/testdata/sf0.001/events.parquet")
      .select(col("event_id"), col("user_id"),
        sax_encode_window(collect_list(col("value")).over(trail), 8, 4, 4).as("word"))

    words.write.mode("overwrite").bucketBy(8, "word").sortBy("word")
      .saveAsTable("words_bucketed")

    val t = spark.table("words_bucketed")
    val joined = t.as("a").join(t.as("b"),
      col("a.word") === col("b.word") && col("a.event_id") < col("b.event_id"))

    val physical = joined.queryExecution.executedPlan.toString
    assert(physical.contains("SortMergeJoin"), physical)
    assert(!physical.contains("Exchange hashpartitioning"),
      s"bucketed join should not shuffle:\n$physical")

    // same result as the unbucketed join
    val unbucketed = words.as("a").join(words.as("b"),
      col("a.word") === col("b.word") && col("a.event_id") < col("b.event_id"))
    assert(joined.count() == unbucketed.count())
  }

  test("q78's served join reads both bucketed sides with no Exchange") {
    val df = graft.queries.SaxQueries
      .defs("q78_bucketed_word_join")(spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("Exchange"), s"q78 join must not shuffle:\n$plan")
    assert(df.count() > 0)
  }
}
