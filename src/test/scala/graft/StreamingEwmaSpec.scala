package graft

import graft.queries.{QueryBase, RelQueries}
import graft.streaming.StreamingEwma
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The streaming truncated-EWMA must reproduce the batch q192 per-event
  * arithmetic bit-for-bit after replaying the real events table in time
  * order, with O(1) state per key. */
class StreamingEwmaSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = graft.SparkUtil.configure(
      SparkSession.builder().master("local[4]"), "4").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("streaming EWMA equals the batch q192 per-event frame after replay") {
    val ss = spark
    import ss.implicits._
    val dir = "/root/testdata/sf0.001"
    val ev = spark.read.parquet(s"$dir/events.parquet")
    // time-ordered feed — the arrival order that reproduces the batch
    // (ts_us, event_id) window order across micro-batches
    val rows = ev.select(ev("user_id"), ev("event_id"),
        QueryBase.tsUs(ev).as("ts_us"), ev("event_type"), ev("value"))
      .as[(Long, Long, Long, String, Double)].collect()
      .sortBy(r => (r._3, r._2))
      .map(r => StreamingEwma.EwmaEvent(r._1, r._2, r._3, r._4, r._5))
    assert(rows.length > 500, "fixture should stream a real event table")

    val stream = MemoryStream[StreamingEwma.EwmaEvent](spark)
    val q = StreamingEwma.ewmaStream(stream.toDS())
      .writeStream.format("memory").queryName("ewma_stream")
      .outputMode("append").start()
    rows.grouped(250).foreach { chunk =>
      stream.addData(chunk.toIndexedSeq); q.processAllAvailable()
    }
    q.stop()

    val streamed = spark.table("ewma_stream")
      .select("eventId", "eventType", "ewma")
      .as[(Long, String, Double)].collect().toSet
    val batch = RelQueries.ewmaEvents(spark, dir)
      .select("event_id", "event_type", "ewma")
      .as[(Long, String, Double)].collect().toSet
    assert(streamed.size == rows.length)
    assert(streamed == batch,
      s"stream-only: ${(streamed -- batch).take(3)}; " +
        s"batch-only: ${(batch -- streamed).take(3)}")
  }
}
