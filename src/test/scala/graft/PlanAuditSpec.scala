package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Registry-wide plan audit — the regression net behind the per-query
  * pins in PlanShapeSpec: EVERY query in the registry is constructed at
  * sf0.001 and its optimized plan checked for the two shapes that sink
  * a 100 TB deployment silently (values stay right, the plan degrades):
  *
  *  - SINGLE-TASK WINDOWS (empty/foldable partition spec). Legal ONLY
  *    over frames bounded by construction — a post-top-k cut, a decile
  *    table, a quantized value domain, a sketch's bucket table, the
  *    q167/q194 ≤37-key bucket-offset cumsum. The whitelist below pins
  *    each legal site WITH its count, so a new global window anywhere
  *    (or a new one sneaking into a whitelisted query) fails loudly and
  *    forces the stitched-rank / saltedTopK decision consciously.
  *  - CONDITION-LESS JOINS without a broadcast hint (a real cartesian;
  *    the deliberate all-pairs scans — q40's brute baseline — carry the
  *    broadcast hint on the query side and don't match). Zero allowed.
  *
  * Construction also exercises every def's eager stage (at-rest builds,
  * bounded driver collects), so a def that throws at plan time fails
  * here before the oracle gate ever runs. */
class PlanAuditSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val dir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = graft.SparkUtil.configure(
      SparkSession.builder().master("local[8]"), "8").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** Queries whose single-task windows are over BOUNDED frames, with the
    * exact window count — every entry names why it is legal. */
  private val boundedGlobalWindows: Map[String, Int] = Map(
    "q86_length_gate" -> 1,          // percentile offsets over the quantized length domain
    "q92_isax_adaptive_index" -> 1,  // dictionary-sized split cumsum
    "q106_lang_mixture" -> 2,        // per-language mixture over the bounded lang set
    "q114_bpe_merge" -> 1,           // rank over the TakeOrdered top-k merge table
    "q118_quantile_sketch" -> 2,     // sketch bucket table (fixed bucket count)
    "q130_ddsketch_quantile" -> 2,   // DDSketch bucket table (log-bounded)
    "q166_rank_ties" -> 1,           // rank over the bounded tie-domain frame
    "q167_global_rownumber" -> 1,    // day-offset cumsum over the bounded day set
    "q174_skyline" -> 1,             // skyline over the aggregated candidate frontier
    "q194_sorted_neighborhood" -> 2, // <=37-key bucket-offset cumsum (q167 scheme)
    "q195_mutual_information" -> 1,  // joint-distribution table (|langs|x|sources|)
    "q197_decile_lift" -> 1,         // <=10-row decile cumsum (stitched rank feeds it)
    "q200_zipf_fit" -> 1,            // rank over the TakeOrdered top-k vocabulary
    "q220_error_rate_slo" -> 1,      // SLO ladder over the bounded threshold set
    "q273_kruskal_wallis" -> 1,      // rank offsets over the quantized value domain
    "q288_vocab_coverage" -> 1)      // coverage cumsum over the TakeOrdered top-k

  test("every query: single-task windows only over bounded frames; no cartesian joins") {
    val got = scala.collection.mutable.Map[String, Int]()
    val cartesians = scala.collection.mutable.ArrayBuffer[String]()
    val construction = scala.collection.mutable.ArrayBuffer[String]()
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
      try {
        val plan = fn(spark, dir).queryExecution.optimizedPlan
        val st = plan.collect {
          case w: org.apache.spark.sql.catalyst.plans.logical.Window
            if w.partitionSpec.forall(_.foldable) => w
        }.size
        if (st > 0) got(name) = st
        // a condition-less join is exempt ONLY under a BROADCAST-strategy
        // hint (the deliberate all-pairs scans broadcast their bounded
        // side) — any other hint (shuffle_replicate_nl, merge, …) still
        // replicates a corpus against a corpus at scale
        val cart = plan.collect {
          case j: org.apache.spark.sql.catalyst.plans.logical.Join
            if j.condition.isEmpty &&
              !Seq(j.hint.leftHint, j.hint.rightHint).flatten.exists(
                _.strategy.contains(
                  org.apache.spark.sql.catalyst.plans.logical.BROADCAST)) => j
        }.size
        if (cart > 0) cartesians += s"$name ($cart)"
      } catch {
        case t: Throwable => construction += s"$name: ${t.getClass.getSimpleName}"
      }
    }
    assert(construction.isEmpty,
      s"queries failed at plan construction: ${construction.mkString(", ")}")
    assert(cartesians.isEmpty,
      s"condition-less unhinted joins (cartesian at scale): ${cartesians.mkString(", ")}")
    assert(got.toMap == boundedGlobalWindows,
      "single-task window census changed — added entries need a bounded-frame " +
        s"justification in the whitelist, removed ones should be deleted.\n" +
        s"new/changed: ${(got.toSet -- boundedGlobalWindows.toSet).mkString(", ")}\n" +
        s"missing: ${(boundedGlobalWindows.toSet -- got.toSet).mkString(", ")}")
  }
}
