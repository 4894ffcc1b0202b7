package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The q127/q128/q129 at-rest index contract: the SERVING plan must
  * contain zero training stages — the build's Lloyd iterations happen
  * once, at layout time, never inside a probe. Pins the three shapes the
  * round-9 verdict asked for:
  *   - the probe scans the corpus parquet exactly ONCE (the filtered
  *     query side; training would need several full-corpus scans);
  *   - the cell-bucketed code table is bucket-PRUNED by the literal
  *     probed-cell IN filter (SelectedBucketsCount in the scan);
  *   - all joins are broadcast (no SortMergeJoin/ShuffledHashJoin — the
  *     corpus-side never shuffles before the bounded candidate sum);
  *   - the incremental encode (q129) likewise: one batch scan, index
  *     tables read, no training.
  * Value-level equivalence (probe == live-trained q100, batch encode ==
  * rebuild encode) is the oracle gate's job — q128/q129 rows. */
class IvfIndexPlanSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val dir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = graft.SparkUtil.configure(
      SparkSession.builder().master("local[4]"), "4").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def embScans(plan: String): Int =
    "embeddings\\.parquet".r.findAllIn(plan).length

  test("q128 probe: one corpus scan, bucket-pruned codes, broadcast-only joins") {
    val df = VectorQueries.defs("q128_ivf_index_probe")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(embScans(plan) == 1,
      s"probe must scan embeddings exactly once (the query side); training inlined?\n$plan")
    assert(plan.contains("SelectedBucketsCount"),
      s"code-table scan must be bucket-pruned by the literal probed-cell filter:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      s"probe joins must all be broadcast:\n$plan")
    assert(df.count() > 0)
  }

  test("q129 incremental encode: one batch scan, no training, broadcast-only joins") {
    val df = VectorQueries.defs("q129_ivf_incremental_encode")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(embScans(plan) == 1,
      s"batch encode must scan embeddings exactly once (the batch); retraining inlined?\n$plan")
    assert(plan.contains("graft_ivfb"),
      s"encode must read the persisted pre-batch index tables:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      s"encode joins must all be broadcast:\n$plan")
    assert(df.count() > 0)
  }

  test("q128 probe-from-index equals live-trained q100 bit-identically") {
    // the whole point of the at-rest index: serving from persisted
    // artifacts loses NOTHING vs training inside the query — same
    // centroids, same codebook, same ADC arithmetic, same top-5
    val probe = VectorQueries.defs("q128_ivf_index_probe")(spark, dir)
      .collect().map(_.toString).sorted.toSeq
    val live = VectorQueries.defs("q100_ivfadc_nprobe")(spark, dir)
      .collect().map(_.toString).sorted.toSeq
    assert(probe == live,
      s"probe-only: ${(probe.toSet -- live.toSet).take(3)}; " +
        s"live-only: ${(live.toSet -- probe.toSet).take(3)}")
  }
}
