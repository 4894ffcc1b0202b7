package graft

import graft.queries.{QueryBase, RelQueries}
import graft.streaming.StreamingDebounce
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The streaming debounce must reproduce the batch q164 per-event keep
  * decisions exactly after replaying the real events table in time
  * order, with one timestamp of state per user. */
class StreamingDebounceSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = graft.SparkUtil.configure(
      SparkSession.builder().master("local[4]"), "4").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("streaming debounce equals the batch q164 per-event decisions after replay") {
    val ss = spark
    import ss.implicits._
    val dir = "/root/testdata/sf0.001"
    val ev = spark.read.parquet(s"$dir/events.parquet")
    val rows = ev.select(ev("user_id"), ev("event_id"),
        QueryBase.tsUs(ev).as("ts_us"), ev("event_type"), ev("value"))
      .as[(Long, Long, Long, String, Double)].collect()
      .sortBy(r => (r._3, r._2))
      .map(r => StreamingDebounce.DebEvent(r._1, r._2, r._3, r._4, r._5))
    assert(rows.length > 500, "fixture should stream a real event table")

    val stream = MemoryStream[StreamingDebounce.DebEvent](spark)
    val q = StreamingDebounce.debounceStream(stream.toDS())
      .writeStream.format("memory").queryName("debounce_stream")
      .outputMode("append").start()
    rows.grouped(250).foreach { chunk =>
      stream.addData(chunk.toIndexedSeq); q.processAllAvailable()
    }
    q.stop()

    val streamed = spark.table("debounce_stream")
      .select("eventId", "keep")
      .as[(Long, Boolean)].collect().toMap
    val batch = RelQueries.debounceEvents(spark, dir)
      .select("event_id", "keep")
      .as[(Long, Boolean)].collect().toMap
    assert(streamed.size == rows.length)
    assert(streamed == batch, {
      val diff = streamed.collect { case (k, v) if batch.get(k) != Some(v) => k }
      s"diverging event_ids: ${diff.take(5)}"
    })
    // suppression must actually fire on the fixture
    assert(streamed.values.exists(!_), "expected at least one dropped event")
  }
}
