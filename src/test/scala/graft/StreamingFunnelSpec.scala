package graft

import graft.queries.{QueryBase, RelQueries}
import graft.streaming.StreamingFunnel
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The streaming funnel's final per-user state must equal the batch q156
  * stage frame after replaying the real events table — and because min is
  * order-independent, it must ALSO converge identically under a shuffled
  * arrival order (the property the EWMA twin cannot have). */
class StreamingFunnelSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val dir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = graft.SparkUtil.configure(
      SparkSession.builder().master("local[4]"), "4").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def batchStages(): Map[Long, (Option[Long], Option[Long], Option[Long])] = {
    val ss = spark
    import ss.implicits._
    RelQueries.funnelStages(spark, dir)
      .as[(Long, Option[Long], Option[Long], Option[Long])]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
  }

  private def replay(rows: Seq[StreamingFunnel.FunnelEvent], name: String)
  : Map[Long, (Option[Long], Option[Long], Option[Long])] = {
    val ss = spark
    import ss.implicits._
    val stream = MemoryStream[StreamingFunnel.FunnelEvent](spark)
    val q = StreamingFunnel.funnelStream(stream.toDS())
      .writeStream.format("memory").queryName(name)
      .outputMode("update").start()
    rows.grouped(300).foreach { chunk =>
      stream.addData(chunk.toIndexedSeq); q.processAllAvailable()
    }
    q.stop()
    spark.table(name)
      .as[StreamingFunnel.FunnelOut].collect()
      .groupBy(_.userId)
      .map { case (u, outs) =>
        val last = outs.maxBy(_.rev)
        u -> ((last.t1, last.t2, last.t3))
      }
  }

  test("streaming funnel state equals the batch q156 stage frame after replay") {
    val ss = spark
    import ss.implicits._
    val ev = spark.read.parquet(s"$dir/events.parquet")
    val rows = ev.select(ev("user_id"), QueryBase.tsUs(ev).as("ts_us"), ev("event_type"))
      .as[(Long, Long, String)].collect()
      .sortBy(r => (r._2, r._1))
      .map(r => StreamingFunnel.FunnelEvent(r._1, r._2, r._3))
    assert(rows.length > 500, "fixture should stream a real event table")

    val expected = batchStages()
    val ordered = replay(rows, "funnel_stream_ordered")
    assert(ordered == expected,
      s"ordered replay diverged: ${(ordered.toSet -- expected.toSet).take(3)}")

    // order-independence: reversed arrival must converge to the same state
    val reversed = replay(rows.reverse, "funnel_stream_reversed")
    assert(reversed == expected,
      s"reversed replay diverged: ${(reversed.toSet -- expected.toSet).take(3)}")
  }
}
