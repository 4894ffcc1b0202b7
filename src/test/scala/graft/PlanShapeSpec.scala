package graft

import graft.queries.{RelQueries, VectorQueries}
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape regressions the oracle can't catch (the values stay right
  * even when the plan degrades): q44 must verify candidate pairs BEFORE
  * deduplicating them, and q72's per-group ranking must sort once. */
class PlanShapeSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val dir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = graft.SparkUtil.configure(
      SparkSession.builder().master("local[4]"), "4").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("q44 runs the cosine filter below the candidate distinct") {
    val plan = VectorQueries.defs("q44_embed_neardup")(spark, dir)
      .queryExecution.executedPlan.toString
    // plans print top-down: the distinct (HashAggregate) must appear
    // ABOVE the cos >= 0.3 filter, i.e. the selective verify runs first
    // and the distinct shuffles only surviving pairs
    val agg = plan.indexOf("HashAggregate")
    val cut = plan.indexOf(">= 0.3")
    assert(agg >= 0 && cut >= 0, plan)
    assert(agg < cut,
      s"the cosine filter must run before (below) the distinct:\n$plan")
  }

  test("q153's correlated subquery decorrelates into one aggregate + join") {
    val plan = RelQueries.defs("q153_correlated_subquery")(spark, dir)
      .queryExecution.executedPlan.toString
    // Catalyst must rewrite the per-row scalar subquery into a grouped
    // aggregate joined back on the correlation key — a surviving
    // per-row subquery node means the inner aggregate re-executes per
    // outer row (a scan per row at scale)
    assert(!plan.contains("ScalarSubquery"),
      s"correlated subquery not decorrelated:\n$plan")
    assert(plan.contains("Join"), s"no decorrelation join in:\n$plan")
  }

  test("q167 numbers rows per-day with a broadcast offset join, never a global window") {
    val plan = RelQueries.defs("q167_global_rownumber")(spark, dir)
      .queryExecution.executedPlan.toString
    // the data-sized row_number window must be PARTITIONED (by day) —
    // an unpartitioned spec here moves the whole event stream through
    // one task; the only unpartitioned window allowed is the cumsum
    // over the bounded day-count frame
    val rn = "row_number\\(\\) windowspecdefinition\\(day#".r
    assert(rn.findFirstIn(plan).isDefined,
      s"row_number window not partitioned by day:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"day offsets must broadcast back, not shuffle the stream:\n$plan")
  }

  test("q172 attributes purchases in one window pass, no purchase-click self-join") {
    val plan = RelQueries.defs("q172_last_touch")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"),
      s"last-touch attribution must be a window, not a self-join:\n$plan")
  }

  test("q179 resolves the point-in-time lookup without any join") {
    val plan = RelQueries.defs("q179_scd2_lookup")(spark, dir)
      .queryExecution.executedPlan.toString
    // the interleaved carry-forward rewrite must not degrade back into
    // the theta join + argmax the oracle runs (per-key pair fan-out)
    assert(!plan.contains("Join"),
      s"SCD2 lookup must be union + window, not a join:\n$plan")
  }

  test("q72 ranks the events window in a single sort") {
    val q = RelQueries.defs("q72_quantiles")(spark, dir)
    val plan = q.queryExecution.executedPlan.toString
    val sorts = "(?m)^\\s*(?:[+:]-\\s*)?\\*?\\(?\\d*\\)?\\s*Sort \\[".r
      .findAllIn(plan).size
    assert(sorts == 1, s"expected exactly one Sort, got $sorts:\n$plan")
    assert(!plan.contains("Join"), s"single-pass q72 must not join back:\n$plan")
    // still correct: 4 quantiles per event type present in the data
    val rows = q.collect()
    val types = rows.map(_.getString(0)).distinct
    assert(rows.length == types.length * 4)
  }

  test("q236's EXISTS executes as one LEFT SEMI join, no fan-out") {
    val plan = RelQueries.defs("q236_q4_priority_check")(spark, dir)
      .queryExecution.executedPlan.toString
    // the lateness EXISTS must be a semi join (one probe row out per
    // order, never the lineitem fan-out a plain join + distinct would pay)
    assert(plan.contains("LeftSemi"), s"expected a LeftSemi join:\n$plan")
    assert(!plan.contains("Distinct"),
      s"semi join must not need a post-join distinct:\n$plan")
  }

  test("q235's top-10 executes as TakeOrderedAndProject, never a global sort") {
    val plan = RelQueries.defs("q235_q3_shipping_priority")(spark, dir)
      .queryExecution.executedPlan.toString
    // orderBy+limit must fuse into the per-partition top-k + merge
    // operator — a 100 TB aggregate never passes through one sorted task
    assert(plan.contains("TakeOrderedAndProject"),
      s"expected TakeOrderedAndProject:\n$plan")
  }

  test("q241 broadcasts the per-part threshold frame back onto the fact") {
    val plan = RelQueries.defs("q241_q17_small_quantity")(spark, dir)
      .queryExecution.executedPlan.toString
    // both joins (brand part dim, per-part threshold frame) must
    // broadcast — the brand-filtered lineitems never shuffle
    val bc = "BroadcastHashJoin".r.findAllIn(plan).size
    assert(bc >= 2, s"expected both q241 joins broadcast, got $bc:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"q241 must not shuffle the fact side:\n$plan")
  }

  test("q257 reuses the cached per-part frame and broadcasts the 1-row total") {
    val plan = RelQueries.defs("q257_q11_important_parts")(spark, dir)
      .queryExecution.executedPlan.toString
    // the partkey aggregation is tcached: both the total and the HAVING
    // probe must read the SAME materialization, never re-aggregate the
    // supply facts twice
    val cached = "InMemoryTableScan".r.findAllIn(plan).size
    assert(cached >= 2, s"expected both q257 consumers on the cache, got $cached:\n$plan")
    // the concentration threshold joins via the broadcast 1-row total
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"q257's scalar total must broadcast:\n$plan")
  }

  test("q258's supplier exclusion is a broadcast anti-join, nothing shuffles but the pair dedup") {
    val plan = RelQueries.defs("q258_q16_supplier_counts")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("LeftAnti"), s"expected an anti join:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"q258's dims must broadcast, not shuffle the pairs:\n$plan")
  }

  test("q259 keeps part and supplier dims broadcast around the one-pass pair aggregate") {
    val plan = RelQueries.defs("q259_q20_part_promotion")(spark, dir)
      .queryExecution.executedPlan.toString
    val bc = "BroadcastHashJoin".r.findAllIn(plan).size
    assert(bc >= 2, s"expected promo-part + supplier joins broadcast, got $bc:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"q259 must not shuffle-join the fact side:\n$plan")
  }

  /** Logical windows whose partition spec is empty or all-literal — the
    * single-task shape the r14 stitched-rank rewrites removed. Counted on
    * the optimized plan (AQE hides the physical tree pre-execution). */
  private def singleTaskWindows(df: org.apache.spark.sql.DataFrame): Int =
    df.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window
        if w.partitionSpec.forall(_.foldable) => w
    }.size

  test("the r14 stitched ranks keep corpus-sized frames out of single-task windows") {
    // q197: the only surviving global window is the ≤10-row decile cumsum
    assert(singleTaskWindows(RelQueries.defs("q197_decile_lift")(spark, dir)) == 1)
    // q202/q198/q290: none at all — ranks ride the bucket stitch
    assert(singleTaskWindows(RelQueries.defs("q202_rfm_segments")(spark, dir)) == 0)
    assert(singleTaskWindows(RelQueries.defs("q198_time_to_convert")(spark, dir)) == 0)
    assert(singleTaskWindows(RelQueries.defs("q290_kaplan_meier")(spark, dir)) == 0)
  }

  test("q200/q114 rank only a distributed top-k, never the full vocabulary") {
    for (q <- Seq("q200_zipf_fit", "q114_bpe_merge")) {
      val plan = graft.queries.TextQueries.defs(q)(spark, dir)
        .queryExecution.executedPlan.toString
      assert(plan.contains("TakeOrderedAndProject"),
        s"$q must cut to top-k with TakeOrderedAndProject before ranking:\n$plan")
    }
  }

  test("q294/q295 flagship pipelines never shuffle-join: every dedup stage broadcasts") {
    // the funnel's dedup stages must stay [combinable min + BROADCAST
    // semi/anti join] — a SortMergeJoin here means the corpus shuffles
    // for dedup, the exact shape the q56 discipline exists to prevent
    for (q <- Seq("q294_training_pipeline", "q295_pipeline_delta")) {
      val plan = graft.queries.TextQueries.defs(q)(spark, dir)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
        s"$q must broadcast its survivor key sets, never shuffle the corpus:\n$plan")
      val semi = "BroadcastHashJoin .*LeftSemi|LeftSemi.*BuildRight".r
      assert(semi.findFirstIn(plan).isDefined,
        s"$q's dedup stages must be broadcast semi joins:\n$plan")
    }
  }

  test("q296 ranks via the salted two-phase: no single-task or low-cardinality corpus window") {
    val df = graft.queries.MultimodalQueries.defs("q296_multimodal_knn")(spark, dir)
    assert(singleTaskWindows(df) == 0)
    // the window tree must be exactly [per-query re-rank of the bounded
    // survivors] over [the (query_id, salt) phase-1 cut] — logical collect
    // is top-down, so partition-spec widths read (1, 2). A regression back
    // to one per-query window over the corpus shows up as Seq(1).
    val widths = df.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window =>
        w.partitionSpec.size
    }
    assert(widths == Seq(1, 2),
      s"q296 must cut candidates on (query_id, salt) before the per-query rank, got $widths")
  }

  test("q302 serves hybrid fusion from both persisted indexes, bucket-pruned") {
    val df = VectorQueries.defs("q302_hybrid_serve")(spark, dir)
    assert(singleTaskWindows(df) == 0)
    val plan = df.queryExecution.executedPlan.toString
    assert("documents\\.parquet".r.findAllIn(plan).length == 1,
      s"only the query docs may scan documents (corpus text serves from the index):\n$plan")
    assert(plan.contains("graft_inv_post") && plan.contains("graft_ivf_codes"),
      s"both persisted indexes must appear in the plan:\n$plan")
    assert("SelectedBucketsCount".r.findAllIn(plan).length >= 2,
      s"the posting AND code scans must bucket-prune on their literal probes:\n$plan")
    // BOTH corpus-proportional candidate ranks must ride the salted
    // two-phase: the sparse posting candidates (common terms) AND the
    // dense probed-cell ADC candidates (each cell ~ |corpus|/cells rows)
    val salted = df.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window
        if w.partitionSpec.size == 2 => w
    }.size
    assert(salted == 2,
      s"expected the sparse AND dense candidate ranks on (query_id, salt), got $salted")
    // every corpus-adjacent join must broadcast its bounded side
    // deterministically — in particular the docs-sized dl table joins
    // the Σ-df candidate frame, which must be the explicit build side,
    // never an AQE coin-flip into a corpus shuffle. The ONE allowed
    // sort-merge is the rank-space RRF fusion: FULL OUTER (no broadcast
    // hash form exists) over two ≤ queries·depth rank lists — bounded by
    // construction, never corpus-shaped.
    val smj = "SortMergeJoin".r.findAllIn(plan).size
    assert(smj <= 1 && !plan.contains("ShuffledHashJoin") &&
        (smj == 0 || "SortMergeJoin.*FullOuter".r.findFirstIn(plan).isDefined),
      s"q302 may sort-merge only the bounded full-outer fusion:\n$plan")
    assert(df.count() == 15, "3 queries x top-5 fused")
  }

  test("the ANN scans rank via the salted two-phase: no direct corpus-sized per-query window") {
    // the r15 verdict's weak #1: these five shapes ranked corpus-
    // proportional scored frames with a direct per-query window (10
    // single-task sorts of |corpus| rows each at scale). Each must now
    // read as [per-query re-rank of bounded survivors] over [the
    // (query_id, salt) phase-1 cut] — logical collect is top-down, so a
    // regression back to one direct window shows up as a missing 2.
    val expected = Map(
      "q40_ann_brute" -> Seq(1, 2),            // brute cosine over the corpus
      "q112_sq8_ann" -> Seq(1, 2),             // int8 dot over the corpus
      "q116_trunc_rerank" -> Seq(1, 1, 2),     // stage-2 rerank window is
                                               // bounded (≤ RerankC rows/query)
      "q89_pq_adc" -> Seq(1, 2),               // pure-ADC scan (q104 shares it)
      "q104_opq_adc" -> Seq(1, 2),
      "q128_ivf_index_probe" -> Seq(1, 2),     // probed-cell ADC tail
      "q307_erasure_forget_rebuild" -> Seq(1, 2), // the retained green generation's probe
      // the r16 sweep below the verdict's top-5 cut — same anti-pattern,
      // same fix (candidate frames are corpus-proportional: in-cell
      // members, hot LSH buckets, the BM25 postings, the kNN crossJoin)
      "q46_ann_ivf" -> Seq(1, 2),              // in-cell exact top-5
      "q110_ivf_nprobe" -> Seq(1, 2),
      "q176_hybrid_rrf" -> Seq(1, 1, 2, 1, 1, 2), // both fused rank lists
      "q199_knn_classify" -> Seq(1, 1, 2),     // 5-NN vote cut
      "q260_retrieval_ndcg" -> Seq(1, 2),      // top-NdcgK candidate cut
      "q282_average_precision" -> Seq(1, 1, 2), // cut + bounded cumsum
      // q215's truth (a depth-1 salted pair) materializes driver-side at
      // construction, and the hit's rank is a COUNT against the bounded
      // hit frame — so the SERVED plan carries no window at all
      "q215_retrieval_mrr" -> Seq(),
      // per-source bottom-K (KMV); perSrc feeds both the sketch and the
      // merged union, so the salted pair appears once per branch
      "q122_kmv_merge" -> Seq(1, 2, 1, 2))
    val all = VectorQueries.defs ++ graft.queries.DedupQueries.defs
    for ((q, want) <- expected) {
      val df = all(q)(spark, dir)
      assert(singleTaskWindows(df) == 0, s"$q grew a single-task window")
      val widths = df.queryExecution.optimizedPlan.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window =>
          w.partitionSpec.size
      }
      assert(widths == want,
        s"$q must cut candidates on (query_id, salt) before the per-query rank, got $widths")
    }
  }

  test("q304 serves the erased BM25 from the persisted index + tombstones, nothing rebuilt") {
    val df = graft.queries.TextQueries.defs("q304_erasure_text_serve")(spark, dir)
    assert(singleTaskWindows(df) == 0)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("graft_inv_post") && plan.contains("graft_erase_docs"),
      s"the persisted postings AND the tombstone store must both serve:\n$plan")
    assert(plan.contains("SelectedBucketsCount"),
      s"the posting scan must bucket-prune on the literal query terms:\n$plan")
    assert("documents\\.parquet".r.findAllIn(plan).length == 1,
      s"only the query docs may scan documents (the erased corpus is never re-read):\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      s"every q304 join is bounded and must broadcast:\n$plan")
    // window tree, top-down: the salted per-query rank pair over the
    // Σ df candidates, then the bounded per-query-doc term cut
    val widths = df.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window =>
        w.partitionSpec.size
    }
    assert(widths == Seq(1, 2, 1),
      s"q304 must rank candidates via the salted two-phase, got $widths")
  }

  test("q305 serves the erased ADC from the persisted index + tombstones, both bucket-pruned") {
    val df = VectorQueries.defs("q305_erasure_ann_serve")(spark, dir)
    assert(singleTaskWindows(df) == 0)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("graft_ivf_codes") && plan.contains("graft_erase_vecs"),
      s"the persisted codes AND the tombstone store must both serve:\n$plan")
    assert("SelectedBucketsCount".r.findAllIn(plan).length >= 2,
      s"the code AND tombstone scans must both prune to the probed cells' buckets:\n$plan")
    assert("embeddings\\.parquet".r.findAllIn(plan).length == 1,
      s"only the query vectors may scan embeddings (no training stage, no corpus rescan):\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      s"the tombstone anti join and the LUT joins must broadcast:\n$plan")
    val widths = df.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window =>
        w.partitionSpec.size
    }
    assert(widths == Seq(1, 2),
      s"q305's ADC rank must ride the salted two-phase, got $widths")
  }

  test("q310 serves the erased mm probe from the persisted index + tombstones, both bucket-pruned") {
    val df = graft.queries.MultimodalQueries.defs("q310_erasure_mm_serve")(spark, dir)
    assert(singleTaskWindows(df) == 0)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("graft_mm_codes") && plan.contains("graft_erase_mm"),
      s"the persisted mm codes AND the tombstone store must both serve:\n$plan")
    assert("SelectedBucketsCount".r.findAllIn(plan).length >= 2,
      s"the code AND tombstone scans must both prune to the probed cells' buckets:\n$plan")
    assert("documents\\.parquet".r.findAllIn(plan).length == 1,
      s"only the query docs may scan documents (no corpus re-embed):\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      s"the tombstone anti join and the probe joins must broadcast:\n$plan")
  }

  test("q286 accumulates the Gram matrix with the partial aggregator, no pair explode") {
    val plan = VectorQueries.defs("q286_covariance_spectrum")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("gramaggregator"),
      s"q286 must fold the covariance through GramAggregator:\n$plan")
  }
}
