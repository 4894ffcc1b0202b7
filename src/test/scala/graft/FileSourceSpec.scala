package graft

import graft.queries.RelQueries
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** q132 — the §2.3 file-format source surface. The oracle proves the
  * VALUES survive the JSONL/CSV round trip; this spec proves the PLAN
  * actually reads through Spark's JSON and CSV scan paths (a regression
  * that silently re-read parquet would still produce green values). */
class FileSourceSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val dir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = graft.SparkUtil.configure(
      SparkSession.builder().master("local[4]"), "4").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("q132 probes scan JSON and CSV file sources, not parquet") {
    val q = RelQueries.defs("q132_file_source_roundtrip")(spark, dir)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("FileScan json"), s"no JSON scan in:\n$plan")
    assert(plan.contains("FileScan csv"), s"no CSV scan in:\n$plan")
    assert(!plan.contains("FileScan parquet"),
      s"probe must serve from the at-rest copies, not re-read parquet:\n$plan")
  }

  test("q132 results agree across json/csv and parquet surfaces") {
    val viaFiles = RelQueries.defs("q132_file_source_roundtrip")(spark, dir)
      .collect().map(_.toString).sorted.toSeq
    import org.apache.spark.sql.functions._
    val viaParquet = spark.read.parquet(s"$dir/documents.parquet")
      .withColumn("h",
        conv(substring(md5(col("text")), 1, 15), 16, 10).cast("long") % 1000003L)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("sum_chars"),
        sum("h").as("text_fp"), countDistinct("source").as("n_sources"))
      .collect().map(_.toString).sorted.toSeq
    assert(viaFiles == viaParquet)
  }

  test("q143 probe scans the ORC source with the lang predicate pushed") {
    val q = RelQueries.defs("q143_orc_source_roundtrip")(spark, dir)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("FileScan orc"), s"no ORC scan in:\n$plan")
    assert(!plan.contains("FileScan parquet"),
      s"probe must serve from the at-rest ORC copy, not parquet:\n$plan")
    val scanLine = plan.linesIterator.find(_.contains("FileScan orc"))
      .getOrElse(fail("no orc scan line"))
    assert(scanLine.contains("PushedFilters") && scanLine.contains("lang"),
      s"lang predicate not pushed into the ORC reader: $scanLine")
  }

  test("q143 results agree across orc and parquet surfaces") {
    val viaOrc = RelQueries.defs("q143_orc_source_roundtrip")(spark, dir)
      .collect().map(_.toString).sorted.toSeq
    import org.apache.spark.sql.functions._
    val viaParquet = spark.read.parquet(s"$dir/documents.parquet")
      .where(col("lang") =!= "und")
      .withColumn("h",
        conv(substring(md5(col("text")), 1, 15), 16, 10).cast("long") % 1000003L)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("sum_chars"),
        sum("h").as("text_fp"), min("doc_id").as("min_doc"),
        countDistinct("source").as("n_sources"))
      .collect().map(_.toString).sorted.toSeq
    assert(viaOrc == viaParquet)
  }

  test("q155 merged read spans both schema generations in one union-schema scan") {
    val df = SparkEntry.queries("q155_schema_evolution")(spark, dir)
    // both generation directories feed the read...
    val files = df.inputFiles
    assert(files.exists(_.contains("evo1")) && files.exists(_.contains("evo2")),
      s"merged read missing a generation: ${files.mkString(", ")}")
    // ...through ONE FileScan whose ReadSchema is the UNION (gen1 files
    // lack event_type; the scan must still carry it)
    val plan = df.queryExecution.executedPlan.toString
    val scan = plan.linesIterator
      .find(l => l.contains("FileScan") && l.contains("evo"))
      .getOrElse(fail(s"no evolved-layout scan in:\n$plan"))
    assert(scan.contains("event_type"), s"union schema not read: $scan")
    // the added column genuinely back-fills: gen1 rows surface as the
    // 'unknown' default and carry real measure values
    val unknown = df.collect().find(_.getString(0) == "unknown")
      .getOrElse(fail("no gen1 rows surfaced under the default label"))
    assert(unknown.getLong(1) > 0)
  }
}
