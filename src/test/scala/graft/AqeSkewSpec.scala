package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** q142's scale contract: with half the fact on one join key and
  * broadcast disabled, AQE must detect the skewed shuffle partition at
  * RUNTIME and split it (OptimizeSkewedJoin) — the executed plan's
  * sort-merge join carries skew=true. Value-level equality with the
  * naive replay is the oracle gate's job (q142 row). */
class AqeSkewSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val dir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = graft.SparkUtil.configure(
      SparkSession.builder().master("local[4]"), "4").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("q142's fixture skew is real: the mega-key holds ~half the fact") {
    val ev = spark.read.parquet(s"$dir/events.parquet")
    val n = ev.count()
    val onKey = ev.where(col("event_id") % 2 === 0).count()
    assert(n > 100, s"fixture too small: $n rows")
    assert(onKey * 10 >= n * 4 && onKey * 10 <= n * 6,
      s"even event_ids are $onKey of $n — not ~half")
  }

  test("q142 executed plan splits the skewed partition (skew=true)") {
    val df = SparkEntry.queries("q142_aqe_skew_join")(spark, dir)
    df.collect() // AQE decides at runtime — materialize first
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"),
      s"join was not a sort-merge join:\n$plan")
    assert(plan.contains("skew=true"),
      s"no skew split in the executed plan:\n$plan")
  }
}
