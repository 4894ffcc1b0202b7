package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** q139's scale contract: the selective orders filter must reach the
  * lineitem side as a runtime bloom filter — a bloom_filter_agg over the
  * filtered keys feeding a might_contain probe on the fact side, applied
  * BEFORE the fact's shuffle (semi-join reduction). Value equality with
  * the plain join is the oracle row's job. */
class RuntimeFilterSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val dir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = graft.SparkUtil.configure(
      SparkSession.builder().master("local[4]"), "4").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("q139 plan carries the runtime bloom filter on the fact side") {
    val df = SparkEntry.queries("q139_runtime_bloom_join")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("bloom_filter_agg"),
      s"no bloom filter built from the dim side:\n$plan")
    assert(plan.toLowerCase.contains("might_contain"),
      s"no bloom probe on the fact side:\n$plan")
    // the join itself must be a shuffle join (the 100 TB shape the conf
    // isolation reproduces) — a broadcast would make the bloom pointless
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
      s"join is not a shuffle join:\n$plan")
    // the conf isolation stayed in the child session: the shared session
    // still has its defaults (others' plans must not change)
    assert(spark.conf.get("spark.sql.autoBroadcastJoinThreshold") != "-1",
      "q139 leaked autoBroadcastJoinThreshold into the parent session")
    assert(df.limit(1).count() == 1)
  }
}
