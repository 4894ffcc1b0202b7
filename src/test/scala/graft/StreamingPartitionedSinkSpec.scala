package graft

import graft.streaming.{PartitionedIngest, SaxStreaming}
import graft.streaming.SaxStreaming.SeriesEvent
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The write half of the partitioned event-store lifecycle: streaming
  * ingestion through PartitionedIngest must land every row in exactly the
  * day directory the BATCH layout (q134's partitionedEventsTable rule)
  * would choose, and the written layout must serve partition-pruned reads
  * — closing the loop ingest (stream, by day) → serve (pruned scans). */
class StreamingPartitionedSinkSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = graft.SparkUtil.configure(
        SparkSession.builder().master("local[4]"), "4")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("streamed daily layout is row-identical to the batch derivation and prunes") {
    val ss = spark
    import ss.implicits._
    val events = SaxStreaming.seriesEvents(
        spark.read.parquet("/root/testdata/sf0.001/events.parquet"))
      .collect().sortBy(e => (e.ts, e.eventId))

    val out = java.nio.file.Files.createTempDirectory("graft-ingest-").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ingest-ckpt-").toString
    val stream = MemoryStream[SeriesEvent](spark)
    val q = PartitionedIngest.daily(stream.toDF(), out, ckpt)
    events.grouped(400).foreach { chunk =>
      stream.addData(chunk.toIndexedSeq); q.processAllAvailable()
    }
    q.stop()

    // day directories exist on disk (the physical layout, not a column)
    val dayDirs = new java.io.File(out).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("day="))
    assert(dayDirs.length > 14, s"only ${dayDirs.length} day dirs written")

    // row-identical to the batch rule: same (eventId -> day, value) set
    val streamed = spark.read.parquet(out)
      .select(col("eventId"), col("day").cast("long"), col("value"))
      .as[(Long, Long, Double)].collect().toSet
    val batchDf = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val batch = batchDf
      .select(col("event_id"), graft.queries.QueryBase.tsUs(batchDf).as("ts_us"),
        col("value"))
      .selectExpr("event_id", s"ts_us div ${graft.queries.RelQueries.DayUs} AS day",
        "value")
      .as[(Long, Long, Double)].collect().toSet
    assert(streamed.size == events.length)
    assert(streamed == batch,
      s"stream-only: ${(streamed -- batch).take(3)}; batch-only: ${(batch -- streamed).take(3)}")

    // and the written layout serves pruned scans: a one-day filter's scan
    // carries PartitionFilters (the q134 serving contract on the
    // STREAM-written files)
    val oneDay = dayDirs.map(_.getName.stripPrefix("day=").toLong).min
    val pruned = spark.read.parquet(out).where(col("day") === oneDay)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [") && plan.contains("day"),
      s"no partition filters on the stream-written layout:\n$plan")
    assert(pruned.count() > 0)

    // COMPACTION: the multi-batch ingest left >1 file in at least one day
    // (3 micro-batches over ~30 days); compactDaily must rewrite to
    // exactly one file per day with identical content
    def parquetFiles(d: java.io.File) =
      d.listFiles().count(f => f.getName.endsWith(".parquet"))
    assert(dayDirs.exists(parquetFiles(_) > 1),
      "fixture never produced a multi-file day — compaction untested")
    val compacted = java.nio.file.Files.createTempDirectory("graft-compact-").toString
    PartitionedIngest.compactDaily(spark, out, compacted)
    val cDirs = new java.io.File(compacted).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("day="))
    assert(cDirs.length == dayDirs.length, "compaction changed the day set")
    assert(cDirs.forall(parquetFiles(_) == 1),
      s"days with != 1 file after compaction: ${cDirs.filter(parquetFiles(_) != 1).map(_.getName).toSeq}")
    val compactedRows = spark.read.parquet(compacted)
      .select(col("eventId"), col("day").cast("long"), col("value"))
      .as[(Long, Long, Double)].collect().toSet
    assert(compactedRows == streamed, "compaction changed the content")
  }
}
