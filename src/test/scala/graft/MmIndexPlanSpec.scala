package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The q297/q298/q299 multimodal at-rest index contract — the
  * IvfIndexPlanSpec discipline applied to the extract→ANN bridge:
  *   - the probe (q298) scans documents exactly ONCE (the 3-row query
  *     side; extraction or centroid training inlined would scan more);
  *   - the cell-bucketed code table is bucket-PRUNED by the literal
  *     probed-cell IN filter (SelectedBucketsCount in the scan);
  *   - all joins are broadcast (no SortMergeJoin/ShuffledHashJoin);
  *   - the blob-fed probe (q299) reads NO documents parquet at all —
  *     query side is the real binaryFile scan, corpus side the persisted
  *     index — completing ingest → extract → ANN as one lifecycle;
  *   - probing the persisted index loses nothing vs the in-plan
  *     derivation: q298's rows == the same routing computed live.
  * Value-level equivalence vs the full DuckDB replay is the oracle
  * gate's job (q297/q298/q299 rows). */
class MmIndexPlanSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val dir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = graft.SparkUtil.configure(
      SparkSession.builder().master("local[4]"), "4").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def docScans(plan: String): Int =
    "documents\\.parquet".r.findAllIn(plan).length

  test("q298 probe: one documents scan, bucket-pruned codes, broadcast-only joins") {
    val df = MultimodalQueries.defs("q298_mm_index_probe")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(docScans(plan) == 1,
      s"probe must scan documents exactly once (the query side); extraction inlined?\n$plan")
    assert(plan.contains("SelectedBucketsCount"),
      s"code-table scan must be bucket-pruned by the literal probed-cell filter:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      s"probe joins must all be broadcast:\n$plan")
    assert(df.count() == 15, "3 queries x top-5")
  }

  test("q299 blob probe: binaryFile query side, zero documents scans, pruned index reads") {
    val df = MultimodalQueries.defs("q299_blob_extract_ann")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(docScans(plan) == 0,
      s"the blob-fed probe must not touch documents parquet (queries come from blobs, corpus from the index):\n$plan")
    assert(plan.contains("binaryFile"),
      s"query side must be the real binaryFile source scan:\n$plan")
    assert(plan.contains("SelectedBucketsCount"),
      s"code-table scan must be bucket-pruned:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      s"probe joins must all be broadcast:\n$plan")
    assert(df.count() == 20, "4 blob queries x top-5")
  }

  test("q301 incremental encode: binaryFile batch, zero documents scans, no training") {
    val df = MultimodalQueries.defs("q301_mm_incremental_encode")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(docScans(plan) == 0,
      s"the batch encode must not touch documents parquet (batch from blobs, centroids persisted):\n$plan")
    assert(plan.contains("binaryFile"),
      s"batch side must be the binaryFile source scan:\n$plan")
    assert(plan.contains("graft_mm_cents"),
      s"assignment must read the persisted centroid table:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      s"encode joins must all be broadcast:\n$plan")
    assert(df.count() == 8, "32 blobs / mod 4 selector")
  }

  test("q303 probes both generations bucket-pruned, one documents scan, broadcast-only joins") {
    val df = MultimodalQueries.defs("q303_mm_index_generations")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(docScans(plan) == 0,
      s"the served plan must not scan documents at all (queries route once, driver-bounded; both corpora serve from the generation tables):\n$plan")
    assert(plan.contains("graft_mmg_codes1") && plan.contains("graft_mmg_codes2"),
      s"both generation code tables must appear in the plan:\n$plan")
    assert("SelectedBucketsCount".r.findAllIn(plan).length >= 2,
      s"both generation scans must bucket-prune on the literal probed cells:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      s"probe joins must all be broadcast:\n$plan")
    assert(df.count() == 30, "2 generations x 3 queries x top-5")
    // the blue/green contract itself: the pinned (gen-1) probe must be
    // IMMUTABLE under the green landing — re-probing after the green
    // table exists returns the identical row set (the oracle separately
    // proves gen 1 == pre-rebuild arithmetic and gen 2 == post-append)
    val pinned1 = df.where(col("gen") === 1).collect().map(_.toString).toSet
    val pinned2 = MultimodalQueries.defs("q303_mm_index_generations")(spark, dir)
      .where(col("gen") === 1).collect().map(_.toString).toSet
    assert(pinned1 == pinned2, "the pinned generation drifted between probes")
  }

  test("q296/q298 agree wherever the probe's cells contain the true top-5") {
    // not an equality (nprobe=2 routing can miss true neighbors — that's
    // what recall ladders measure) but a containment sanity: every probe
    // hit must also be scored identically by the brute bridge
    val brute = MultimodalQueries.defs("q296_multimodal_knn")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val probe = MultimodalQueries.defs("q298_mm_index_probe")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val shared = probe.keySet intersect brute.keySet
    assert(shared.nonEmpty, "probe and brute top-5 sets should overlap on this corpus")
    shared.foreach { k =>
      assert(probe(k) == brute(k), s"cosine drifted between probe and brute at $k")
    }
  }
}
