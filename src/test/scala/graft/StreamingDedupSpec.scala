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

  test("late arrivals beyond the horizon are dropped and state is evicted") {
    val ss = spark
    import ss.implicits._
    val t0 = 1800000000000L // ms epoch
    val min = 60000L
    def doc(id: Long, tsMs: Long, text: String) =
      DocEvent(id, new java.sql.Timestamp(tsMs), text)
    val stream = MemoryStream[DocEvent](spark)
    val src = stream.toDS().select(col("docId").as("doc_id"), col("ts"), col("text"))
    val q = StreamingDedup.exactDedupStream(src.toDF(), "10 minutes")
      .select("doc_id", "h")
      .writeStream.format("memory").queryName("late_dedup")
      .outputMode("append").start()

    // on-time wave: two distinct contents
    stream.addData(doc(1, t0, "alpha alpha"), doc(2, t0 + 1, "beta beta"))
    q.processAllAvailable()
    // advance event time 30 min -> watermark t0+20min; the t0 state rows
    // are now beyond the 10-minute horizon and must be evicted
    stream.addData(doc(3, t0 + 30 * min, "gamma gamma"))
    q.processAllAvailable()
    // late wave, behind the watermark: a re-arrival of known content AND a
    // novel late doc — both must be dropped entirely (neither re-emits nor
    // sneaks in as a "new" row after its group's state was evicted)
    stream.addData(doc(4, t0 + 2, "alpha alpha"), doc(5, t0 + 3, "delta delta"))
    q.processAllAvailable()
    val stateRows = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
    q.stop()

    val out = spark.table("late_dedup").collect().map(_.getLong(0)).sorted
    // output == batch dedup restricted to the on-time data: docs 1, 2, 3
    assert(out.sameElements(Array(1L, 2L, 3L)), out.mkString(","))
    // state is bounded by the lateness horizon, not by distinct-content
    // history: the two t0 hashes were evicted, only doc 3's hash remains
    assert(stateRows == 1, s"state not evicted by watermark: $stateRows rows")
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
