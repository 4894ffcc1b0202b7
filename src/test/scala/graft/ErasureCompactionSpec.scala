package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The physical half of text erasure: q304's tombstones leave the erased
  * bytes in the posting files (merge-on-read), q308's compaction rewrites
  * them out (copy-on-write). The oracle gate already proves both answer
  * the retained-corpus truth; what it CANNOT see is the bytes and the
  * plan — that the compacted generation physically contains no erased
  * row, and that its serve plan carries no tombstone/decrement table.
  * Those are exactly what GDPR compaction exists for, so they get pinned
  * here. */
class ErasureCompactionSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val dir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = graft.SparkUtil.configure(
      SparkSession.builder().master("local[4]"), "4").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("the compacted generation physically contains zero erased rows") {
    // force the build, then read the compacted tables straight from the
    // catalog — the erased cohort must be byte-absent, not just filtered
    graft.queries.TextQueries.defs("q308_erasure_compaction")(spark, dir).collect()
    val sfx = dir.replaceAll("[^A-Za-z0-9]", "_")
    val erased = graft.queries.QueryBase.erasedId(col("doc_id"))
    for (t <- Seq(s"graft_cmp_post_$sfx", s"graft_cmp_dl_$sfx")) {
      val leaks = spark.table(t).where(erased).count()
      assert(leaks == 0L, s"$t still holds $leaks erased rows after compaction")
    }
    // and the compaction genuinely removed something (non-vacuous): the
    // source postings DO hold erased rows
    val pre = spark.table(s"graft_inv_post_$sfx").where(erased).count()
    assert(pre > 0L, "degenerate fixture: the source index holds no erased rows")
  }

  test("the compacted serve plan carries no tombstone or decrement table and stays bucket-pruned") {
    val df = graft.queries.TextQueries.defs("q308_erasure_compaction")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("graft_cmp_post"),
      s"the compacted postings must serve:\n$plan")
    assert(!plan.contains("graft_erase_docs") && !plan.contains("graft_erase_dfdec"),
      s"the compacted serve must not consult the merge-on-read store:\n$plan")
    assert(plan.contains("SelectedBucketsCount"),
      s"the compacted posting scan must bucket-prune on the literal query terms:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      s"every q308 join is bounded and must broadcast:\n$plan")
  }

  test("merge-on-read (q304) and the compacted rewrite (q308) answer identically") {
    def rows(q: String) = graft.queries.TextQueries.defs(q)(spark, dir)
      .orderBy("query_id", "rnk").collect().map(_.toString).toIndexedSeq
    val mor = rows("q304_erasure_text_serve")
    val cow = rows("q308_erasure_compaction")
    assert(mor.nonEmpty && mor == cow,
      s"the two delete styles diverged (${mor.size} vs ${cow.size} rows)")
  }
}
