package graft

import graft.queries.{QueryBase, RelQueries}
import graft.streaming.StreamingSessions
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The streaming gap sessionizer replayed over the real events table must
  * converge to the batch window's exact session frame, and its emitted
  * spans driven through the SHARED day-clip + boundary + running-sum
  * arithmetic must reproduce the oracle-gated q264 per-day peak report
  * bit-identically — the interval family's live twin, proven the same
  * way as StreamingFunnel/Debounce. */
class StreamingSessionsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val dir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = graft.SparkUtil.configure(
      SparkSession.builder().master("local[4]"), "4").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def eventRows(): Array[StreamingSessions.SpanEvent] = {
    val ss = spark; import ss.implicits._
    val ev = spark.read.parquet(s"$dir/events.parquet")
    ev.select(ev("user_id"), QueryBase.tsUs(ev).as("ts_us"), ev("event_id"))
      .as[(Long, Long, Long)].collect()
      .sortBy(r => (r._2, r._3)) // the ordered-feed contract
      .map(r => StreamingSessions.SpanEvent(r._1, r._2, r._3))
  }

  /** Replay rows through the stream in chunks; final session per
    * (userId, sUs) = its max-rev emission. */
  private def streamSessions(rows: Seq[StreamingSessions.SpanEvent],
                             name: String): Set[(Long, Long, Long)] = {
    val ss = spark; import ss.implicits._
    val stream = MemoryStream[StreamingSessions.SpanEvent](spark)
    val q = StreamingSessions.sessionStream(stream.toDS(), RelQueries.SweepGapUs)
      .writeStream.format("memory").queryName(name)
      .outputMode("update").start()
    rows.grouped(500).foreach { chunk =>
      stream.addData(chunk.toIndexedSeq); q.processAllAvailable()
    }
    q.stop()
    spark.table(name).as[StreamingSessions.SessionOut].collect()
      .groupBy(o => (o.userId, o.sUs))
      .map { case ((u, s), outs) => (u, s, outs.maxBy(_.rev).eUs) }
      .toSet
  }

  test("streamed sessions equal the batch gap-window frame; peak report bit-equal to q264") {
    val ss = spark; import ss.implicits._
    val rows = eventRows()
    assert(rows.length > 500, "fixture should stream a real event table")

    val streamed = streamSessions(rows, "sess_stream")

    // 1. session-frame equality against the batch window derivation
    val ev = spark.read.parquet(s"$dir/events.parquet")
    val batchSpans = RelQueries.gapSessionsOf(
        ev.select(ev("user_id"), QueryBase.tsUs(ev).as("ts_us"), ev("event_id")))
      .as[(Long, Long, Long)].collect().toSet
    assert(streamed == batchSpans,
      s"session frames diverged; onlyStream=${(streamed -- batchSpans).take(3)} " +
        s"onlyBatch=${(batchSpans -- streamed).take(3)}")

    // 2. the emitted spans through the SHARED clip/boundary/peak
    //    arithmetic reproduce the oracle-gated q264 report exactly
    val spansDf = streamed.toSeq.toDF("user_id", "s_us", "e_us")
    val liveBounds = RelQueries.clipSpansToBoundaries(spansDf)
    val livePeak = RelQueries.peakOfBoundaries(liveBounds)
      .as[(Long, Long, Long, Long)].collect().toSet
    val batchPeak = graft.SparkEntry.queries("q264_peak_concurrency")(spark, dir)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(livePeak == batchPeak,
      s"peak reports diverged; onlyLive=${(livePeak -- batchPeak).take(3)}")

    // 3. … and the q265 coverage report too, off the same live boundaries
    val liveCov = RelQueries.coverageOfBoundaries(liveBounds)
      .as[(Long, Long, Double)].collect().toSet
    val batchCov = graft.SparkEntry.queries("q265_interval_coverage")(spark, dir)
      .as[(Long, Long, Double)].collect().toSet
    assert(liveCov == batchCov,
      s"coverage reports diverged; onlyLive=${(liveCov -- batchCov).take(3)}")
  }

  test("mid-stream emissions are sessions-sized and closed rows are final") {
    val ss = spark; import ss.implicits._
    val g = RelQueries.SweepGapUs
    // one user: two sessions (gap > SweepGapUs between them), fed across
    // THREE batches so the open session re-emits and then closes
    val s1 = Seq(StreamingSessions.SpanEvent(7L, 1000L, 1L),
                 StreamingSessions.SpanEvent(7L, 2000L, 2L))
    val s2 = Seq(StreamingSessions.SpanEvent(7L, 3000L, 3L))
    val s3 = Seq(StreamingSessions.SpanEvent(7L, 3000L + g + 1L, 4L))
    val stream = MemoryStream[StreamingSessions.SpanEvent](spark)
    val q = StreamingSessions.sessionStream(stream.toDS(), g)
      .writeStream.format("memory").queryName("sess_incr")
      .outputMode("update").start()
    Seq(s1, s2, s3).foreach { b => stream.addData(b); q.processAllAvailable() }
    q.stop()
    val outs = spark.table("sess_incr")
      .as[StreamingSessions.SessionOut].collect().sortBy(_.rev)
    // batch 1: open [1000,2000]; batch 2: open [1000,3000];
    // batch 3: CLOSE [1000,3000] + open the new point session
    assert(outs.map(o => (o.sUs, o.eUs, o.closed)).toSeq == Seq(
      (1000L, 2000L, false), (1000L, 3000L, false),
      (1000L, 3000L, true), (3000L + g + 1L, 3000L + g + 1L, false)))
  }
}
