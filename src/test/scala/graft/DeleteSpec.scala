package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The q161/q162 delete contract: a copy-on-write purge must rewrite
  * ONLY the partitions inside the purge window — every other partition's
  * original files are referenced byte-untouched — and the merge-on-read
  * deletion-vector form of the same delete must agree row-for-row with
  * zero rewrite. Value equality against the raw-replay oracle is the
  * gate's job (q161/q162 rows, one shared oracle text). */
class DeleteSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val dir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = graft.SparkUtil.configure(
      SparkSession.builder().master("local[4]"), "4").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def table(prefix: String): String = spark.catalog.listTables()
    .filter(col("name").startsWith(prefix)).collect()(0).name

  test("q161 kept partitions reference the ORIGINAL files, rewrites stay in the window") {
    SparkEntry.queries("q161_purge_cow")(spark, dir).queryExecution.toRdd.count()
    val man = spark.table(table("graft_purge_man"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    val v1Files = spark.table(table("graft_events_byday")).inputFiles.toSet
    val dayOf = (f: String) => "day=(-?\\d+)".r.findFirstMatchIn(f).get.group(1).toLong
    val cutoff = v1Files.map(dayOf).min + graft.queries.RelQueries.PurgeDays

    val kept = man.filter(_._2 == "keep").map(_._1)
    val rw = man.filter(_._2 == "rw").map(_._1)
    assert(kept.nonEmpty && rw.nonEmpty, s"degenerate manifest: ${man.length} rows")
    // byte reuse: every kept entry IS a v1 file, and together they are
    // exactly v1's out-of-window partitions
    assert(kept.forall(v1Files.contains), "kept entry not a v1 file")
    assert(kept.map(dayOf).forall(_ >= cutoff), "kept entry inside the purge window")
    assert(v1Files.filter(f => dayOf(f) >= cutoff) == kept.toSet,
      "kept set != v1's out-of-window files")
    // the rewrite generation never touches v1's directories
    assert(rw.forall(f => !v1Files.contains(f) && dayOf(f) < cutoff),
      "rewrite leaked outside the purge window or into v1")
  }

  test("copy-on-write and merge-on-read deletes agree; MoR plans an anti join") {
    val cow = SparkEntry.queries("q161_purge_cow")(spark, dir)
      .collect().map(_.toString).sorted.toSeq
    val mor = SparkEntry.queries("q162_purge_mor")(spark, dir)
    val morPlan = mor.queryExecution.executedPlan.toString
    assert(morPlan.contains("LeftAnti"), s"no anti join in MoR plan:\n$morPlan")
    assert(!morPlan.contains("/rw"), s"MoR read touched the rewrite generation:\n$morPlan")
    val morRows = mor.collect().map(_.toString).sorted.toSeq
    assert(cow == morRows, "CoW and MoR deletes diverge")
    // and the delete genuinely removed rows
    val full = spark.table(table("graft_events_byday")).count()
    val after = SparkEntry.queries("q162_purge_mor")(spark, dir)
      .agg(sum("n_events")).collect()(0).getLong(0)
    assert(after < full, "purge deleted nothing")
  }
}
