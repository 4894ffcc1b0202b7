package graft

import graft.queries.{QueryBase, RelQueries}
import graft.streaming.SlidingStreaming
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The q177 sliding windows maintained over a STREAM must equal the batch
  * aggregation after replaying the same events, with state bounded by the
  * open-window count at every point. */
class SlidingStreamingSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = graft.SparkUtil.configure(
      SparkSession.builder().master("local[4]"), "4").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("streaming sliding windows equal the batch q177 aggregation after replay") {
    val ss = spark
    import ss.implicits._
    val dir = "/root/testdata/sf0.001"
    val ev = spark.read.parquet(s"$dir/events.parquet")
    val rows = ev.select(ev("event_type"), ev("value"),
        QueryBase.tsUs(ev).as("ts_us"))
      .as[(String, Double, Long)].collect()
    assert(rows.length > 500, "fixture should stream a real event table")

    val stream = MemoryStream[(String, Double, Long)](spark)
    val q = SlidingStreaming.slidingHourly(
        stream.toDF().toDF("event_type", "value", "ts_us"))
      .writeStream.format("memory").queryName("sliding_agg")
      .outputMode("complete").start()
    // window-count bound: every window intersecting the observed span,
    // per type — the state that makes overlap streamable
    val hours = rows.map(_._3 / 3600000000L)
    val bound = (hours.max - hours.min + 3) * rows.map(_._1).distinct.length
    rows.grouped(200).foreach { chunk =>
      stream.addData(chunk.toIndexedSeq); q.processAllAvailable()
      assert(spark.table("sliding_agg").count() <= bound)
    }
    q.stop()

    val streamed = spark.table("sliding_agg")
      .as[(String, Long, Long, Double)].collect().toSet
    val batch = RelQueries.defs("q177_sliding_window")(spark, dir)
      .as[(String, Long, Long, Double)].collect().toSet
    assert(streamed == batch,
      s"stream-only: ${(streamed -- batch).take(3)}; " +
        s"batch-only: ${(batch -- streamed).take(3)}")
  }
}
