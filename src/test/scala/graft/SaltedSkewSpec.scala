package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Skew-mitigation-by-salting, the technique for the one shuffle AQE's
  * skew handling cannot split: a skewed groupBy with a NON-combinable
  * aggregate (collect_list & co. must see every row of a key in one
  * task — map-side partial aggregation doesn't shrink them, and AQE only
  * splits skewed JOIN partitions, not aggregation groups).
  *
  * Two-phase salted form: group on (key, salt) so the hot key's rows land
  * on S tasks, then re-group on key to merge the S partial lists. The
  * spec proves (a) per-key results are identical to the direct form, and
  * (b) the first exchange really partitions on (key, salt) — the property
  * that bounds any single task at |hot key| / S rows at 100 TB. */
class SaltedSkewSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = graft.SparkUtil.configure(
      SparkSession.builder().master("local[4]"), "4").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("salted two-phase collect matches direct groupBy on a skewed key") {
    // 40k rows, half on one hot key — the shape of a SAX word histogram
    val df = spark.range(40000).select(
      when(col("id") % 2 === 0, lit("hot"))
        .otherwise(concat(lit("k"), col("id") % 997)).as("key"),
      col("id").as("v"))

    val direct = df.groupBy("key")
      .agg(sort_array(collect_list(col("v"))).as("vs"))

    val salted = df
      .withColumn("salt", pmod(xxhash64(col("v")), lit(16)))
      .groupBy("key", "salt")
      .agg(collect_list(col("v")).as("partial"))
      .groupBy("key")
      .agg(sort_array(flatten(collect_list(col("partial")))).as("vs"))

    assert(salted.exceptAll(direct).isEmpty && direct.exceptAll(salted).isEmpty)

    // the phase-1 shuffle must key on (key, salt): that is what divides
    // the hot key across 16 tasks instead of funneling it into one
    val plan = salted.queryExecution.executedPlan.toString
    assert(plan.contains("hashpartitioning(key") && plan.contains("salt"))
  }
}
