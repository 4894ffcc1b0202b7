package graft

import graft.sax.{Sax, SaxWindow}
import graft.streaming.SaxStreaming
import graft.streaming.SaxStreaming.SeriesEvent
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The streaming operator must replay to exactly the batch window query's
  * words (the reference's sliding-window == batch equivalence,
  * src/symtseries.c:816-850, lifted to the cluster operator level). */
class SaxStreamingSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = graft.SparkUtil.configure(
        SparkSession.builder().master("local[4]"), "4")
      .config("spark.sql.streaming.checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-ckpt").toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("snapshot/restore round-trip continues identically (serialize_sax semantics)") {
    val a = new SaxWindow(8, 4, 4)
    val values = Array(1.0, 5.0, Double.NaN, 3.0, -2.0, Double.PositiveInfinity, 4.0)
    values.foreach(a.push)
    val restored = SaxStreaming.restore(SaxStreaming.snapshot(a), 8, 4, 4)
    assert(restored.currentWord == a.currentWord)
    val more = Array(0.5, -1.5, 2.5, Double.NaN, 7.0)
    more.foreach { v =>
      a.push(v); restored.push(v)
      assert(restored.currentWord == a.currentWord)
      assert(restored.currentMu == a.currentMu && restored.currentS2 == a.currentS2)
    }
  }

  test("streaming windowed encode over 3 micro-batches equals the batch window query") {
    val ss = spark
    import ss.implicits._
    val n = 8; val w = 4; val c = 4

    val events = SaxStreaming.seriesEvents(
        spark.read.parquet("/root/testdata/sf0.001/events.parquet"))
      .collect()
      .sortBy(e => (e.ts, e.eventId))

    val stream = MemoryStream[SeriesEvent](spark)
    val query = SaxStreaming.encodeStream(stream.toDS(), n, w, c)
      .writeStream.format("memory").queryName("stream_words")
      .outputMode("append").start()

    // three micro-batches split on global arrival order (preserves per-key
    // (ts, eventId) order across batches)
    val chunks = events.grouped(math.ceil(events.length / 3.0).toInt).toSeq
    chunks.foreach { chunk =>
      stream.addData(chunk.toIndexedSeq)
      query.processAllAvailable()
    }
    query.stop()

    val streamed = spark.table("stream_words")
      .select("eventId", "word").as[(Long, String)].collect().toMap

    // batch reference: q02-style sliding window encode
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(-(n - 1), 0)
    val saxEnc = udf((vs: Seq[Double]) => Sax.encodePadded(vs.toArray, n, w, c))
    val expected = spark.read
      .parquet("/root/testdata/sf0.001/events.parquet")
      .select(col("event_id"),
        saxEnc(collect_list(col("value")).over(byUser)).as("word"))
      .as[(Long, String)].collect().toMap

    assert(streamed.size == expected.size)
    val diffs = expected.collect {
      case (id, word) if streamed(id) != word => (id, word, streamed(id))
    }
    assert(diffs.isEmpty, s"first diffs: ${diffs.take(5)}")
  }

  test("event-time windowed words: watermarked agg emits after watermark passes") {
    val ss = spark
    import ss.implicits._
    val base = 1_700_000_000_000_000_000L // ns epoch
    val min = 60L * 1_000_000_000L
    def ev(id: Long, user: Long, tsNs: Long, v: Double) = SeriesEvent(user, id, tsNs, v)
    val stream = MemoryStream[SeriesEvent](spark)
    val q = SaxStreaming.eventTimeWords(stream.toDS(), "1 minute", "30 seconds", 2, 4)
      .writeStream.format("memory").queryName("et_words").outputMode("append").start()
    // window [base, base+1min): 4 values; then an out-of-order straggler
    stream.addData(ev(1, 7, base + 1, 1.0), ev(2, 7, base + 2, 2.0))
    q.processAllAvailable()
    stream.addData(ev(3, 7, base + 3, 3.0), ev(4, 7, base + 4, 10.1))
    q.processAllAvailable()
    // advance the watermark well past the first window
    stream.addData(ev(5, 7, base + 3 * min, 0.0))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("et_words").select("userId", "word")
      .as[(Long, String)].collect()
    // the closed first window holds [1,2,3,10.1] -> "AD" (golden vector)
    assert(rows.contains((7L, "AD")), rows.mkString(","))
  }

  test("watermarked encode with late data: output = batch over on-time events, state bounded") {
    val ss = spark
    import ss.implicits._
    val base = 1_800_000_000_000_000_000L // ns epoch
    val min = 60L * 1_000_000_000L
    def ev(id: Long, tsNs: Long, v: Double) = SeriesEvent(7, id, tsNs, v)
    val onTime = Seq(
      ev(1, base + 1, 1.0), ev(2, base + 2, 2.0),
      ev(3, base + 3, 3.0), ev(4, base + 4, 10.1), // window [base, base+1min)
      ev(5, base + 3 * min, 0.0),                  // advances the watermark
      ev(7, base + 6 * min, 5.0))                  // closes the 3-min window
    // two late events in the first window, behind the watermark — enough
    // values that a failed drop would re-emit a visible (non-null) word
    val late = Seq(ev(6, base + 5, 99.0), ev(8, base + 6, 98.0))

    val stream = MemoryStream[SeriesEvent](spark)
    val q = SaxStreaming.eventTimeWords(stream.toDS(), "1 minute", "30 seconds", 2, 4)
      .writeStream.format("memory").queryName("late_words").outputMode("append").start()
    stream.addData(onTime.take(4)); q.processAllAvailable()
    stream.addData(onTime(4)); q.processAllAvailable()    // watermark -> 2.5 min
    stream.addData(late); q.processAllAvailable()         // must be DROPPED
    stream.addData(onTime(5)); q.processAllAvailable()    // watermark -> 5.5 min
    val stateRows = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
    q.stop()
    val streamed = spark.table("late_words")
      .select(col("window.start").cast("long"), col("word"))
      .as[(Long, String)].collect().toSet

    // batch reference over ONLY the on-time events (withWatermark is a
    // no-op in batch): the late 99.0 must not appear in any emitted word
    val batch = SaxStreaming.eventTimeWords(
        spark.createDataset(onTime), "1 minute", "30 seconds", 2, 4)
      .select(col("window.start").cast("long"), col("word"))
      .as[(Long, String)].collect().toSet
    val closed = streamed // append mode emits only closed windows
    assert(closed.subsetOf(batch),
      s"late data leaked into an emitted word: ${closed.diff(batch)}")
    // the first window DID close with exactly the on-time encode ("AD")
    assert(closed.contains((base / 1_000_000_000L, "AD")), closed)
    // state is bounded by the lateness horizon: only windows at/after the
    // watermark hold rows — never one per ingested window, let alone per row
    assert(stateRows <= 2, s"state not evicted by watermark: $stateRows rows")
  }

  test("session replay: streaming sessionWords equals the batch q102 oracle rows") {
    // the q19 discipline applied to sessions: replay the REAL sf0.001
    // events through the streaming session operator with q102's gap and
    // compare against the hash-checked batch query, row for row on
    // (user, session start, n_events, word)
    val ss = spark
    import ss.implicits._
    val dir = "/root/testdata/sf0.001"
    val events = SaxStreaming.seriesEvents(spark.read.parquet(s"$dir/events.parquet"))
      .collect().sortBy(e => (e.ts, e.eventId))
    val gapSeconds = graft.queries.RelQueries.SessionGapUs / 1000000L

    val stream = MemoryStream[SeriesEvent](spark)
    val q = SaxStreaming.sessionWords(stream.toDS(), s"$gapSeconds seconds", "1 second", 4, 4)
      .writeStream.format("memory").queryName("session_replay")
      .outputMode("append").start()
    events.grouped(400).foreach { chunk =>
      stream.addData(chunk.toIndexedSeq); q.processAllAvailable()
    }
    // a far-future sentinel closes every open session; its own 1-event
    // session is below w values and never encodes
    stream.addData(SeriesEvent(999999L, 999999L, events.map(_.ts).max + (400L * 86400 * 1000000000L), 0.0))
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("session_replay")
      .select(col("userId"), expr("unix_micros(session_window.start)"),
        col("n_events").cast("long"), col("word"))
      .as[(Long, Long, Long, String)].collect().toSet
    val batch = graft.queries.SaxQueries.defs("q102_session_encode")(spark, dir)
      .select(col("user_id"), col("start_us"), col("n_events"), col("word"))
      .as[(Long, Long, Long, String)].collect().toSet
    assert(batch.nonEmpty, "batch produced no sessions")
    assert(streamed == batch,
      s"stream-only: ${streamed.diff(batch).take(3)}; batch-only: ${batch.diff(streamed).take(3)}")
  }

  test("session windows: gap-closed sessions emit the batch encode of their values") {
    val ss = spark
    import ss.implicits._
    val base = 1_900_000_000_000_000_000L // ns epoch
    val sec = 1_000_000_000L
    def ev(id: Long, tsNs: Long, v: Double) = SeriesEvent(9, id, tsNs, v)
    // session 1: 4 events inside 10s gaps; then > 30s silence; session 2
    val s1 = Seq(ev(1, base, 1.0), ev(2, base + 10 * sec, 2.0),
      ev(3, base + 20 * sec, 3.0), ev(4, base + 30 * sec, 10.1))
    val s2 = Seq(ev(5, base + 120 * sec, 4.0), ev(6, base + 125 * sec, 4.5))
    val stream = MemoryStream[SeriesEvent](spark)
    val q = SaxStreaming.sessionWords(stream.toDS(), "30 seconds", "10 seconds", 2, 4)
      .writeStream.format("memory").queryName("session_words")
      .outputMode("append").start()
    stream.addData(s1); q.processAllAvailable()
    stream.addData(s2); q.processAllAvailable()
    // push the watermark far enough to close session 2 as well
    stream.addData(ev(7, base + 600 * sec, 0.0)); q.processAllAvailable()
    q.stop()
    val rows = spark.table("session_words")
      .select("userId", "n_events", "word").as[(Long, Int, String)].collect().toSet
    // session 1 encodes [1,2,3,10.1] -> "AD" (the golden vector); session 2
    // encodes [4.0,4.5] -> its own batch encode
    assert(rows.contains((9L, 4, "AD")), rows)
    assert(rows.contains((9L, 2, graft.sax.Sax.encode(Array(4.0, 4.5), 2, 4))), rows)
    // the 30s-spaced events did NOT split (gap counts from the last event)
    assert(!rows.exists(r => r._1 == 9L && r._2 == 1), rows)
  }

  test("streaming numerosity (Update-mode word counts) matches batch groupBy") {
    val ss = spark
    import ss.implicits._
    val events = SaxStreaming.seriesEvents(
        spark.read.parquet("/root/testdata/sf0.001/events.parquet"))
      .collect().sortBy(e => (e.ts, e.eventId))

    val stream = MemoryStream[SeriesEvent](spark)
    val query = SaxStreaming.wordCounts(stream.toDS(), 8, 4, 4)
      .writeStream.format("memory").queryName("stream_counts")
      .outputMode("complete").start()
    events.grouped(400).foreach { chunk =>
      stream.addData(chunk.toIndexedSeq); query.processAllAvailable()
    }
    query.stop()

    val streamed = spark.table("stream_counts")
      .as[(String, Long)].collect().toMap
    val saxEnc = udf((vs: Seq[Double]) => graft.sax.Sax.encodePadded(vs.toArray, 8, 4, 4))
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(-7, 0)
    val expected = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .select(saxEnc(collect_list(col("value")).over(byUser)).as("word"))
      .groupBy("word").count().as[(String, Long)].collect().toMap
    assert(streamed == expected)
  }
}
