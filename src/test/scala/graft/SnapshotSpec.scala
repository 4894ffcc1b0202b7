package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** q154's time-travel contract: two immutable snapshot versions of one
  * logical table live at rest in separate directories, and the version
  * diff is answered from the SNAPSHOTS ALONE — no raw-history scan
  * anywhere in the probe plan. Value equality against the raw-split
  * recompute is the oracle gate's job (q154 row). */
class SnapshotSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val dir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = graft.SparkUtil.configure(
      SparkSession.builder().master("local[4]"), "4").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("q154 diff is served from the two snapshots, never raw history") {
    val df = SparkEntry.queries("q154_snapshot_diff")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
      l.contains("FileScan") && l.contains("graft_aggmv_v1")),
      s"no v1 snapshot scan in:\n$plan")
    assert(plan.linesIterator.exists(l =>
      l.contains("FileScan") && l.contains("graft_aggmv_v2")),
      s"no v2 snapshot scan in:\n$plan")
    assert(!plan.contains("events.parquet"),
      s"time-travel read rescanned raw history:\n$plan")
  }

  test("v1 bytes are untouched by the v2 write and still readable AS OF v1") {
    SparkEntry.queries("q154_snapshot_diff")(spark, dir).queryExecution.toRdd.count()
    def files(prefix: String): Array[String] = spark.table(
      spark.catalog.listTables()
        .filter(col("name").startsWith(prefix)).collect()(0).name).inputFiles
    val v1Files = files("graft_aggmv_v1")
    val v2Files = files("graft_aggmv_v2")
    assert(v1Files.nonEmpty && v2Files.nonEmpty)
    // copy-on-write: disjoint physical files — the v2 merge wrote a new
    // version, it did not rewrite v1's
    assert(v1Files.toSet.intersect(v2Files.toSet).isEmpty,
      "versions share physical files")
    // AS OF v1 still answers: the superseded version remains a complete,
    // readable table (this is what time travel means)
    val v1 = spark.table(spark.catalog.listTables()
      .filter(col("name").startsWith("graft_aggmv_v1")).collect()(0).name)
    assert(v1.agg(sum("n")).collect()(0).getLong(0) > 0)
  }
}
