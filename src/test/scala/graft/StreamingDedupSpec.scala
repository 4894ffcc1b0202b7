package graft

import graft.streaming.StreamingDedup
import graft.streaming.StreamingDedup.{DedupOut, DocEvent}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The streaming dedup operators must agree with the batch dedup family:
  * first-seen annotation replays to q56's survivor pointers, and the
  * watermarked dropDuplicates keeps exactly one row per content hash. */
class StreamingDedupSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val dir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = graft.SparkUtil.configure(
        SparkSession.builder().master("local[4]"), "4")
      .config("spark.sql.streaming.checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-dedup-ckpt").toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def docEvents(): Array[DocEvent] =
    spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .sortBy(_.getLong(0))
      .map(r => DocEvent(r.getLong(0),
        new java.sql.Timestamp(1700000000000L + r.getLong(0)), r.getString(1)))

  test("first-seen stream over 3 micro-batches replays q56's survivor pointers") {
    val ss = spark
    import ss.implicits._
    val events = docEvents()
    val stream = MemoryStream[DocEvent](spark)
    val q = StreamingDedup.firstSeenStream(stream.toDS())
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    events.grouped(math.ceil(events.length / 3.0).toInt).foreach { chunk =>
      stream.addData(chunk.toIndexedSeq)
      q.processAllAvailable()
    }
    q.stop()
    val streamed = spark.table("dedup_out").as[DedupOut].collect()
      .map(d => d.docId -> (d.canonicalId, d.isDup)).toMap

    val batch = graft.queries.DedupQueries.defs("q56_dedup_survivors")(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getAs[Boolean]("is_dup"))).toMap

    assert(streamed.size == batch.size, "every ingested doc is annotated once")
    val diffs = batch.collect {
      case (id, exp) if streamed(id) != exp => (id, exp, streamed(id))
    }
    assert(diffs.isEmpty, s"first diffs: ${diffs.take(5)}")
  }

  test("watermarked dropDuplicates passes one row per content hash") {
    val ss = spark
    import ss.implicits._
    val events = docEvents()
    val stream = MemoryStream[DocEvent](spark)
    val src = stream.toDS().select(col("docId").as("doc_id"),
      col("ts"), col("text"))
    val q = StreamingDedup.exactDedupStream(src.toDF(), "10 minutes")
      .select("doc_id", "h")
      .writeStream.format("memory").queryName("exact_dedup")
      .outputMode("append").start()
    // feed everything twice: re-arrivals must all be dropped
    stream.addData(events.toIndexedSeq); q.processAllAvailable()
    stream.addData(events.map(e => e.copy(docId = e.docId + 1000000)).toIndexedSeq)
    q.processAllAvailable()
    q.stop()
    val out = spark.table("exact_dedup").collect()
    val nDistinct = graft.queries.DedupQueries.defs("q30_dedup_exact")(spark, dir)
      .collect().head.getAs[Long]("n_distinct")
    assert(out.length == nDistinct, "one survivor per distinct normalized content")
    assert(out.map(_.getString(1)).distinct.length == out.length)
    assert(out.forall(_.getLong(0) < 1000000), "survivors come from the first arrival wave")
  }
}
