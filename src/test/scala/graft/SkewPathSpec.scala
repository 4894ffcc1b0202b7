package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The skew story at scale, both halves:
  *  1. q79's served plan runs the expensive corpus-wide sort on the SALTED
  *     key (fan× parallelism) and only the survivor re-rank on the raw
  *     5-value key — and its ranks equal the direct single-window form.
  *  2. AQE's runtime skew-join splitting engages on a deliberately skewed
  *     join key once a partition crosses the size thresholds — the safety
  *     net for skew we did NOT pre-salt. (Thresholds here are tuned down
  *     so test-scale data crosses them; at 100 TB the defaults do.)
  */
class SkewPathSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = graft.SparkUtil.configure(
        SparkSession.builder().master("local[4]"), "8")
      .config("spark.sql.autoBroadcastJoinThreshold", -1)
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.0")
      .config("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "4096")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "2048")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("q79 sorts on the salted key and matches the direct window") {
    val df = graft.queries.RelQueries
      .defs("q79_skew_type_topk")(spark, "/root/testdata/sf0.01")
    val plan = df.queryExecution.executedPlan.toString

    // exactly two Window operators: the salted rank and the survivor rank
    val windows = plan.linesIterator.filter(_.contains("Window [")).toSeq
    assert(windows.size == 2, s"expected 2 Window ops:\n$plan")
    // the salted window exists — the corpus-wide sort never runs on the
    // raw 5-value key
    assert(windows.exists(_.contains("salt")),
      s"big rank must partition by (event_type, salt):\n$plan")

    // bit-identical to the unsalted direct form
    val direct = spark.read
      .parquet("/root/testdata/sf0.01/events.parquet")
      .select(col("event_type"), col("event_id"), col("value"))
      .withColumn("rnk", row_number().over(Window.partitionBy("event_type")
        .orderBy(desc("value"), col("event_id"))))
      .where(col("rnk") <= 3)
      .select(col("event_type"), col("rnk"), col("event_id"), col("value"))
    assert(df.exceptAll(direct).isEmpty && direct.exceptAll(df).isEmpty)
  }

  test("AQE splits the skewed partition of a deliberately skewed join") {
    // ~80% of rows collapse onto key 0: one shuffle partition dwarfs the
    // median, exactly the shape AQE's OptimizeSkewedJoin exists for
    // both join children must be bare shuffles (OptimizeSkewedJoin matches
    // SMJ(Sort(ShuffleStage), Sort(ShuffleStage)) — an aggregate between
    // shuffle and join defeats it), so the probe side is a filtered scan
    val skewKey = when(col("user_id") < 120, lit(0L)).otherwise(col("user_id")).as("k")
    // repartition(4) gives the join's shuffle FOUR map tasks: AQE splits a
    // skewed reduce partition at map-output granularity, so the single-file
    // local scan's one mapper makes every partition unsplittable (skew
    // count 0 even at 20x median). At real scale inputs arrive in
    // thousands of mappers — same rationale as QueryBase.spread.
    val ev = spark.read
      .parquet("/root/testdata/sf0.01/events.parquet")
      .repartition(4)
      .select(skewKey, col("event_id"), col("props"))
    val probes = spark.read
      .parquet("/root/testdata/sf0.01/events.parquet")
      .where(col("event_id") % 500 === 0)
      .select(skewKey, col("event_id").as("probe_id"))
    val joined = ev.join(probes, "k")

    // execute THIS DataFrame's QueryExecution — count() builds a separate
    // aggregate plan, leaving joined's AdaptiveSparkPlanExec un-replanned
    // (isSkewJoin only flips after the adaptive re-plan actually runs)
    assert(joined.collect().length > 0)
    val finalPlan = joined.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    // QueryStageExec nodes are leaves — plain collect stops at
    // ResultQueryStage/ShuffleQueryStage boundaries, so descend into each
    // stage's materialized plan explicitly
    def collectSmj(p: org.apache.spark.sql.execution.SparkPlan): Seq[SortMergeJoinExec] =
      p.collect {
        case s: SortMergeJoinExec => Seq(s)
        case q: QueryStageExec => collectSmj(q.plan)
        case a: AdaptiveSparkPlanExec => collectSmj(a.executedPlan)
      }.flatten
    val smjs = collectSmj(finalPlan)
    assert(smjs.nonEmpty, s"expected a sort-merge join:\n$finalPlan")
    assert(smjs.exists(_.isSkewJoin),
      s"AQE should have split the skewed partition:\n$finalPlan")
  }
}
