package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** q159's scale contract: the star query's single fact scan must carry
  * BOTH runtime filters — dynamic partition pruning from the day
  * dimension (whole partitions skipped) and the runtime bloom from the
  * segment dimension (rows of surviving partitions skipped before the
  * fact-side shuffle). Value equality against the raw replay is the
  * oracle gate's job (q159 row). */
class StarPlanSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val dir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = graft.SparkUtil.configure(
      SparkSession.builder().master("local[4]"), "4").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("q159 fact scan carries DPP and the bloom in one plan") {
    val df = SparkEntry.queries("q159_star_runtime_filters")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    // partition half: the fact's PartitionFilters must be runtime-pruned
    // through the day dimension
    assert(plan.contains("dynamicpruning"),
      s"no dynamic partition pruning in:\n$plan")
    // row half: the segment dimension's keys reach the fact side as a
    // runtime bloom before its shuffle
    assert(plan.contains("might_contain"),
      s"no runtime bloom filter in:\n$plan")
    val bloomLine = plan.linesIterator
      .find(l => l.contains("might_contain") && l.contains("user_id"))
      .getOrElse(fail(s"bloom not probing the fact's user_id:\n$plan"))
    assert(bloomLine.contains("xxhash64"), bloomLine)
    // and the result is real
    assert(df.limit(1).count() == 1)
  }
}
