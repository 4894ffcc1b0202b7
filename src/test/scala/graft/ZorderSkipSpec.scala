package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** q150's scale contract: the z-ordered layout must let a 2-D box probe
  * skip files on EITHER dimension — including the DAY dimension, which a
  * 1-D user_id clustering (q141's layout) can never skip on — and the
  * manifest-pruned read must equal the unskipped filter over the full
  * layout. Value equality against raw parquet is the oracle gate's job
  * (q150 row). */
class ZorderSkipSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val dir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = graft.SparkUtil.configure(
      SparkSession.builder().master("local[4]"), "4").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def tables(): (String, String) = {
    // run the probe once so the at-rest layout exists
    SparkEntry.queries("q150_zorder_file_skip")(spark, dir).queryExecution.toRdd.count()
    val z = spark.catalog.listTables()
      .filter(col("name").startsWith("graft_events_zorder")).collect()(0).name
    val m = spark.catalog.listTables()
      .filter(col("name").startsWith("graft_events_zman")).collect()(0).name
    (z, m)
  }

  private def probeBox(man: org.apache.spark.sql.DataFrame): (Long, Long, Long, Long) = {
    val b = man.agg(min("min_uid"), max("max_uid"), min("min_day"), max("max_day"))
      .collect()(0)
    val (u0, u1, d0, d1) = (b.getLong(0), b.getLong(1), b.getLong(2), b.getLong(3))
    (u0 + (u1 - u0) / 3, u0 + (2 * (u1 - u0)) / 3,
      d0 + (d1 - d0) / 3, d0 + (2 * (d1 - d0)) / 3)
  }

  test("q150 probe opens a strict subset of the layout's files") {
    val (zT, mT) = tables()
    val df = SparkEntry.queries("q150_zorder_file_skip")(spark, dir)
    val opened = df.inputFiles.filter(_.contains("zdata")).distinct
    val total = spark.table(zT).inputFiles.distinct
    assert(total.length > 3, s"layout produced only ${total.length} files")
    assert(opened.nonEmpty && opened.length < total.length,
      s"no skipping: opened ${opened.length} of ${total.length}")
    assert(spark.table(mT).count() == total.length.toLong,
      "manifest rows != layout files")
  }

  test("q150 skips at least one file on the DAY dimension alone") {
    val (_, mT) = tables()
    val man = spark.table(mT)
    val (ulo, uhi, dlo, dhi) = probeBox(man)
    // a file whose uid box intersects the probe but whose day box does
    // not — exactly the file a 1-D uid clustering would be forced to
    // open; its existence is the z-order payoff
    val dayOnlySkips = man
      .where(col("max_uid") >= ulo && col("min_uid") <= uhi &&
        (col("max_day") < dlo || col("min_day") > dhi))
      .count()
    assert(dayOnlySkips > 0,
      "no file was skippable on day alone — layout is effectively 1-D")
  }

  test("q150 pruned result equals the unskipped filter over the full layout") {
    val (zT, mT) = tables()
    val (ulo, uhi, dlo, dhi) = probeBox(spark.table(mT))
    val full = spark.table(zT)
      .where(col("user_id") >= ulo && col("user_id") <= uhi &&
        col("day") >= dlo && col("day") <= dhi)
      .groupBy("event_type").agg(count(lit(1)).as("n_events"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val pruned = SparkEntry.queries("q150_zorder_file_skip")(spark, dir)
      .select(col("event_type"), col("n_events"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(full == pruned, s"pruned $pruned != full $full")
    assert(pruned.nonEmpty, "degenerate test: probe box matched nothing")
  }
}
