package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** q134's scale contract: the date-partitioned at-rest events layout must
  * be PRUNED by the literal time-range filter at planning time — the scan
  * opens only the touched day directories, never the whole table. Beside
  * q78/q128's bucket pruning this pins the second half of the
  * source-pruning story (partition pruning by time). Value-level equality
  * with the raw-parquet replay is the oracle gate's job (q134 row). */
class PartitionPruneSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val dir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = graft.SparkUtil.configure(
      SparkSession.builder().master("local[4]"), "4").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("q134 scan carries partition filters and reads only the window's days") {
    val df = SparkEntry.queries("q134_partition_pruned_scan")(spark, dir)
    // AQE wraps the physical plan, so find the scan via the plan STRING
    // (the repo's plan-spec idiom): the partitioned table's FileScan line
    // must carry the day bounds as PartitionFilters (metadata-level
    // pruning) and leave PushedFilters empty (nothing evaluated per row
    // after opening files).
    val plan = df.queryExecution.executedPlan.toString
    val scanLine = plan.linesIterator
      .find(l => l.contains("FileScan") && l.contains("graft_events_byday"))
      .getOrElse(fail(s"no FileScan of the partitioned table in:\n$plan"))
    val pf = "PartitionFilters: \\[[^\\]]*\\]".r.findFirstIn(scanLine)
      .getOrElse(fail(s"no PartitionFilters on the scan: $scanLine"))
    assert(pf.contains("day"), s"partition filters don't bound day: $pf")
    assert(">=.*19|>= *\\d".r.findFirstIn(pf).isDefined &&
      pf.contains("<="), s"day range bounds missing: $pf")
    assert(scanLine.contains("PushedFilters: []"),
      s"day bounds leaked into data filters: $scanLine")

    // the layout has more days than the 7-day window — pruning is real,
    // not vacuous (sf0.001 spans ~30 days)
    val events = spark.read.parquet(s"$dir/events.parquet")
    val allDays = events
      .select(graft.queries.QueryBase.tsUs(events).as("ts_us"))
      .selectExpr(s"ts_us div ${graft.queries.RelQueries.DayUs} AS day")
      .distinct().count()
    assert(allDays > 14, s"fixture spans only $allDays days")
    val resultDays = df.select("day").distinct().count()
    assert(resultDays <= 7, s"window returned $resultDays days")
    assert(resultDays > 0, "window returned no days")
  }

  test("q135 fact scan is pruned DYNAMICALLY through the dim filter") {
    val df = SparkEntry.queries("q135_dynamic_partition_prune")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    val scanLine = plan.linesIterator
      .find(l => l.contains("FileScan") && l.contains("graft_events_byday"))
      .getOrElse(fail(s"no FileScan of the partitioned fact in:\n$plan"))
    // the day filter cannot be a literal at plan time (it lives on the
    // dim relation) — DPP must inject a runtime partition filter
    assert(scanLine.toLowerCase.contains("dynamicpruning"),
      s"no dynamic pruning on the fact scan: $scanLine")
    // and the pruning is real: only dow-0 days survive (~1/7 of ~30)
    val kept = df.select("day").distinct().count()
    assert(kept > 0 && kept <= 6, s"dow-0 window kept $kept days")
  }
}
