package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Scale contracts of the at-rest maintenance trio:
  *
  *  - q137: the bucketed fact-fact join must consume the on-disk layout —
  *    a SortMergeJoin with ZERO Exchange below it (the write paid the
  *    shuffle once; a per-query shuffle of both fact tables is exactly
  *    what bucketing exists to delete).
  *  - q138: the incremental merge must be O(delta) — the probe reads the
  *    persisted aggregate table plus only the delta rows of the raw
  *    events; history is never re-aggregated.
  *  - q136: the gap-fill grid works per-user partition — no global-sort
  *    window (the repo's unpartitioned-window warnings are bounded-domain
  *    cumsums; an unpartitioned window over the hour grid would not be).
  *
  * Value-level equality with the raw-parquet replays is the oracle gate's
  * job (q136/q137/q138 rows). */
class AtRestMaintenanceSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val dir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = graft.SparkUtil.configure(
      SparkSession.builder().master("local[4]"), "4").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("q137 joins the bucketed tables with no Exchange below the SMJ") {
    val df = SparkEntry.queries("q137_bucketed_colocated_join")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"no SortMergeJoin in:\n$plan")
    // the join keys' distribution comes from the bucketed scans — any
    // hash Exchange on a key column means the layout was not consumed
    assert(!plan.contains("Exchange hashpartitioning(o_orderkey"),
      s"orders side re-shuffled:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning(l_orderkey"),
      s"lineitem side re-shuffled:\n$plan")
    val bucketedScans = plan.linesIterator
      .filter(l => l.contains("FileScan") &&
        (l.contains("graft_orders_bkt") || l.contains("graft_lineitem_bkt")))
      .toSeq
    assert(bucketedScans.size == 2, s"expected 2 bucketed scans in:\n$plan")
    bucketedScans.foreach(l =>
      assert(l.contains("Bucketed: true"), s"scan not bucketed: $l"))
    // and the result is real (value equality is the oracle row's job)
    assert(df.limit(1).count() == 1)
  }

  test("q138 probe reads the persisted base + only the delta rows") {
    val df = SparkEntry.queries("q138_incremental_mv_merge")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    // history arrives as the at-rest aggregate table...
    assert(plan.linesIterator.exists(l =>
      l.contains("FileScan") && l.contains("graft_events_aggmv")),
      s"no scan of the persisted aggregate in:\n$plan")
    // ...and the only raw-events scan is delta-filtered (the modulo
    // predicate survives to the scan's data filters)
    val rawScan = plan.linesIterator
      .find(l => l.contains("FileScan") && l.contains("events.parquet"))
      .getOrElse(fail(s"no raw events scan in:\n$plan"))
    assert(rawScan.contains("% 10") || plan.contains("(event_id#"),
      s"delta filter missing from the raw scan: $rawScan")
    // the merge really combines overlapping keys: merged n_events exceeds
    // what either side alone carries for some (day, type)
    val base = spark.table(
      plan.linesIterator.find(_.contains("graft_events_aggmv"))
        .flatMap("graft_events_aggmv[a-z0-9_]*".r.findFirstIn(_)).get)
    val baseTotal = base.agg(org.apache.spark.sql.functions.sum("n")).collect()(0).getLong(0)
    val mergedTotal = df.agg(org.apache.spark.sql.functions.sum("n_events")).collect()(0).getLong(0)
    assert(mergedTotal > baseTotal, "delta contributed no rows to the merge")
  }

  test("q149 upsert reads the persisted state + only the delta rows") {
    val df = SparkEntry.queries("q149_merge_upsert")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    // history arrives as the at-rest keyed state table...
    assert(plan.linesIterator.exists(l =>
      l.contains("FileScan") && l.contains("graft_events_state")),
      s"no scan of the persisted state in:\n$plan")
    // ...and the only raw-events scan is delta-filtered
    val rawScan = plan.linesIterator
      .find(l => l.contains("FileScan") && l.contains("events.parquet"))
      .getOrElse(fail(s"no raw events scan in:\n$plan"))
    assert(rawScan.contains("% 10") || plan.contains("(event_id#"),
      s"delta filter missing from the raw scan: $rawScan")
    // the merge is a genuine upsert: some matched key took the DELTA
    // side's row (its event_id is delta-shaped), and unmatched state
    // keys passed through (merged key count == state key count here,
    // since the delta's keys are a subset at this sf)
    val state = spark.table(
      plan.linesIterator.find(_.contains("graft_events_state"))
        .flatMap("graft_events_state[a-z0-9_]*".r.findFirstIn(_)).get)
    val merged = df.collect()
    assert(merged.exists(_.getLong(2) % 10 == 0),
      "no key was updated from the delta batch")
    assert(merged.exists(_.getLong(2) % 10 != 0),
      "every key was overwritten — state contributed nothing")
    assert(merged.length.toLong >= state.count(),
      "merge lost state keys")
  }

  test("q151 sketch-MV merge reads the persisted registers + delta (exact side aside)") {
    val df = SparkEntry.queries("q151_hll_mv_merge")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
      l.contains("FileScan") && l.contains("graft_events_hllmv")),
      s"no scan of the persisted register MV in:\n$plan")
    // raw events appear exactly twice: the %10 delta batch and the
    // deliberately-exact comparison column — never a full register rebuild
    val rawScans = plan.linesIterator
      .filter(l => l.contains("FileScan") && l.contains("events.parquet")).toSeq
    assert(rawScans.size == 2, s"expected 2 raw scans, got ${rawScans.size}:\n$plan")
    assert(rawScans.exists(_.contains("% 10")),
      s"no delta-filtered raw scan:\n${rawScans.mkString("\n")}")
    // the MV stays bounded: days × 256 registers at most
    val mv = spark.table(
      plan.linesIterator.find(_.contains("graft_events_hllmv"))
        .flatMap("graft_events_hllmv[a-z0-9_]*".r.findFirstIn(_)).get)
    val days = mv.select("day").distinct().count()
    assert(mv.count() <= days * 256, "register MV exceeds its bound")
  }

  test("q136 gap-fill windows are user-partitioned (no global sort)") {
    val df = SparkEntry.queries("q136_gapfill_interpolate")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    val windowLines = plan.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    assert(windowLines.nonEmpty, s"no window in:\n$plan")
    windowLines.foreach(l =>
      assert(l.contains("user_id"), s"window not partitioned by user_id: $l"))
    // interpolation actually fired: some hours were filled
    val filled = df.agg(org.apache.spark.sql.functions.sum("n_filled")).collect()(0).getLong(0)
    assert(filled > 0, "fixture has no gaps — interpolation untested")
  }
}
