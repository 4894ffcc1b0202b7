package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The production purge-batch shape for the estate audit (the r17
  * verdict's #7): q311's postings_mor row must be served by the
  * CO-BUCKETED tombstone-postings sort-merge join — zero Exchange on the
  * artifact side — not by broadcasting a cohort that only fits because
  * the test cohort is small. Both tables share the [[PostingBuckets]]
  * term geometry, and hash(term) bucketing satisfies the (term, doc_id)
  * join's clustering requirement (partitioning keys ⊂ join keys), so the
  * only Exchange anywhere in the measure is the final 1-row count's
  * SinglePartition gather. */
class PostingsAuditPlanSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val dir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = graft.SparkUtil.configure(
      SparkSession.builder().master("local[4]"), "4").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("the co-bucketed postings audit runs as a shuffle-free SMJ and matches the broadcast measure") {
    val audit = graft.queries.TextQueries.cobucketedPostingsAudit(spark, dir)
    val plan = audit.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin") && plan.contains("LeftSemi"),
      s"audit must be a sort-merge semi join:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning"),
      s"the co-bucketed audit must not shuffle either side:\n$plan")
    assert(plan.contains("graft_inv_post") && plan.contains("graft_erase_post"),
      s"audit must read both persisted bucketed tables:\n$plan")
    // hash-identical output: the SMJ count equals the broadcast-semi
    // count over the same persisted bytes (and the oracle's pm)
    import org.apache.spark.sql.functions._
    val smj = audit.collect()(0).getLong(0)
    val bcast = spark.table(s"graft_inv_post__root_testdata_sf0_001")
      .join(broadcast(spark.table(s"graft_erase_docs__root_testdata_sf0_001")),
        Seq("doc_id"), "left_semi")
      .agg(count(lit(1))).collect()(0).getLong(0)
    assert(smj == bcast && smj > 0,
      s"co-bucketed audit ($smj) != broadcast audit ($bcast)")
  }
}
