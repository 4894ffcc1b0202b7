package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** q141's scale contract: the min/max manifest over the range-clustered
  * events copy must make the probe open only the files whose [min_uid,
  * max_uid] intersects the predicate window — zone-map file skipping,
  * the stats half of the source-pruning story (q134 pins partition
  * pruning, q137/q78/q128 bucket pruning). Value-level equality with the
  * raw-parquet replay is the oracle gate's job (q141 row). */
class FileSkipSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val dir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = graft.SparkUtil.configure(
      SparkSession.builder().master("local[4]"), "4").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("q141 probe opens a strict subset of the layout's files") {
    val df = SparkEntry.queries("q141_minmax_file_skip")(spark, dir)
    // the probe plan's scan must read fewer files than the layout holds —
    // the manifest skipped some (the middle-third window leaves both
    // domain tails unread; repartitionByRange keyed the files disjointly)
    val opened = df.inputFiles.filter(_.contains("ranged")).distinct
    val total = spark.table(spark.catalog.listTables()
        .filter(col("name").startsWith("graft_events_ranged")).collect()(0).name)
      .inputFiles.distinct
    assert(total.length > 3, s"layout produced only ${total.length} files")
    assert(opened.nonEmpty, "probe opened no data files")
    assert(opened.length < total.length,
      s"no skipping: opened ${opened.length} of ${total.length}")
    // every skipped file's range is genuinely outside the window: the
    // opened set is exactly the manifest's intersecting files
    val man = spark.table(spark.catalog.listTables()
        .filter(col("name").startsWith("graft_events_skipman")).collect()(0).name)
    assert(man.count() == total.length.toLong,
      "manifest rows != layout files")
  }

  test("q141 residual predicate reaches the parquet scan as PushedFilters") {
    val df = SparkEntry.queries("q141_minmax_file_skip")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    val scanLine = plan.linesIterator
      .find(l => l.contains("FileScan") && l.contains("user_id"))
      .getOrElse(fail(s"no FileScan in:\n$plan"))
    assert(
      scanLine.contains("GreaterThanOrEqual(user_id") &&
        scanLine.contains("LessThanOrEqual(user_id"),
      s"user_id window not pushed into the scan: $scanLine")
  }

  test("q141 result equals the unskipped filter over the full layout") {
    val df = SparkEntry.queries("q141_minmax_file_skip")(spark, dir)
    val got = df.orderBy("event_type").collect()
    // replay the same window over the FULL ranged table (no manifest)
    val rT = spark.catalog.listTables()
      .filter(col("name").startsWith("graft_events_ranged")).collect()(0).name
    val all = spark.table(rT)
    val b = all.agg(min("user_id"), max("user_id")).collect()(0)
    val (umin, umax) = (b.getLong(0), b.getLong(1))
    val (lo, hi) = (umin + (umax - umin) / 3, umin + (2 * (umax - umin)) / 3)
    val want = all.where(col("user_id") >= lo && col("user_id") <= hi)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        graft.queries.QueryBase.xsum(col("value"), 6).as("sum_value"))
      .orderBy("event_type").collect()
    assert(got.map(_.toString).toSeq == want.map(_.toString).toSeq,
      s"skipped scan diverges:\n got=${got.mkString(",")}\nwant=${want.mkString(",")}")
  }
}
