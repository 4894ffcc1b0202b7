package graft

import graft.queries.{DedupQueries, VectorQueries}
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The tcache contract (the r9 hygiene-debt close-out): a direct caller
  * looping cache-bearing queries WITHOUT Bench/Verify's clearCache()
  * holds a BOUNDED number of storage entries — each (session, site)
  * keeps one frame, and a re-run unpersists the previous run's. */
class TransientCacheSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val dir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = graft.SparkUtil.configure(
      SparkSession.builder().master("local[4]"), "4").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("looping a caching query does not accumulate storage entries") {
    spark.catalog.clearCache()
    def persisted = spark.sparkContext.getPersistentRDDs.size
    // q32 (one tcache site) + q49 (truth site + the codebook site via its
    // LSH arm) — three runs each, no clearCache between
    DedupQueries.defs("q32_lsh_jaccard_pairs")(spark, dir).count()
    VectorQueries.defs("q49_ann_recall")(spark, dir).count()
    val afterFirst = persisted
    for (_ <- 1 to 2) {
      DedupQueries.defs("q32_lsh_jaccard_pairs")(spark, dir).count()
      VectorQueries.defs("q49_ann_recall")(spark, dir).count()
    }
    val afterThird = persisted
    assert(afterThird <= afterFirst,
      s"storage grew across reruns: $afterFirst -> $afterThird")
    spark.catalog.clearCache()
  }

  test("rerunning a tcache site still SERVES from the cache") {
    // the failure mode this pins: a rerun's frame has the SAME
    // canonicalized plan as its predecessor, so unpersisting the old
    // object AFTER caching the new one removes the just-created
    // CacheManager entry — storage stays bounded (the test above passes)
    // while every run silently recomputes. The executed plan must
    // substitute InMemoryTableScan for the cached subtree.
    spark.catalog.clearCache()
    DedupQueries.defs("q84_estimate_dedup")(spark, dir).count()
    val plan = DedupQueries.defs("q84_estimate_dedup")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("InMemoryTableScan"),
      s"rerun does not read the tcached frame:\n$plan")
    spark.catalog.clearCache()
  }

  test("same-plan re-derivation is a MEMO HIT, not an unpersist+recache") {
    // the r12 ladder fix: before it, a site re-deriving the identical
    // plan (the 8 recall queries rebuilding the same exact-truth frame)
    // unpersisted the materialized predecessor and lazily recached —
    // every caller recomputed. Now the registry returns the EXISTING
    // frame object, so the materialized bytes survive across callers.
    val ss = spark; import ss.implicits._
    spark.catalog.clearCache()
    def mk = Seq((1L, "a"), (2L, "b")).toDF("k", "v").filter($"k" > 0)
    val first = graft.queries.QueryBase.tcache(mk, "spec:memo")
    first.count() // materialize
    val again = graft.queries.QueryBase.tcache(mk, "spec:memo")
    assert(again eq first, "identical plan should return the memoized frame")
    // a DIFFERENT plan at the same site must still replace (the SF-dir
    // switch path Verify depends on)
    val other = graft.queries.QueryBase.tcache(
      Seq((9L, "z")).toDF("k", "v").filter($"k" > 5), "spec:memo")
    assert(!(other eq first), "changed plan must replace the entry")
    spark.catalog.clearCache()
  }
}
