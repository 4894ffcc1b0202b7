package graft

import graft.streaming.SaxStreaming
import graft.streaming.SaxStreaming.SeriesEvent
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Fault-path verification of the `serialize_sax` story
  * (/root/reference/lua/lua_sax.c:293-342): the reference checkpoints its
  * window state so a restarted sandbox resumes mid-series; the Spark
  * analogue is the GroupState store under a durable checkpointLocation.
  * Every prior streaming spec drains cleanly through one query instance —
  * this one KILLS and RESTARTS the query between (and once DURING)
  * micro-batches against a real file source + file sink, and proves the
  * checkpoint-restored ring/moments still converge to the bit-exact
  * arrival-order encode:
  *
  *  - three event chunks land as parquet files; a NEW query instance
  *    (same checkpoint) drains each, so the per-user SAX ring and online
  *    moments cross two restarts through [[SaxStreaming.snapshot]]/
  *    [[SaxStreaming.restore]];
  *  - before the final chunk's drain, a query instance is started and
  *    stopped WITHOUT awaiting progress — whatever partial batch it was
  *    into is uncommitted, and the next instance must redeliver it
  *    exactly-once (the file sink's transaction log discards orphans);
  *  - the sink's final contents are compared row-for-row (eventId →
  *    word) against a driver-side scalar replay of the SAME arrival
  *    order through [[graft.sax.SaxWindow]] — no duplicates, no gaps,
  *    identical words.
  */
class StreamingRestartSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var dir: String = _

  override def beforeAll(): Unit = {
    spark = graft.SparkUtil.configure(
      SparkSession.builder().master("local[4]"), "4").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    dir = java.nio.file.Files.createTempDirectory("graft-restart-").toString
  }

  override def afterAll(): Unit = {
    if (spark != null) spark.stop()
    if (dir != null) graft.queries.AtRestTables.deleteRecursively(dir)
  }

  private val (n, w, c) = (8, 4, 4)

  /** Start ONE fresh query instance over the file source, resuming from
    * the shared checkpoint. */
  private def startQuery() = {
    val ss = spark; import ss.implicits._
    val events = spark.readStream
      .schema("userId LONG, eventId LONG, ts LONG, value DOUBLE")
      .parquet(s"$dir/in").as[SeriesEvent]
    SaxStreaming.encodeStream(events, n, w, c)
      .writeStream.format("parquet")
      .option("path", s"$dir/out")
      .option("checkpointLocation", s"$dir/cp")
      .outputMode("append").start()
  }

  test("SAX state survives kill/restart and converges bit-equal") {
    val ss = spark; import ss.implicits._
    // deterministic multi-user series, ts strictly increasing ACROSS
    // chunks so arrival order == global (ts, eventId) order
    val rng = new scala.util.Random(42)
    val all = (1L to 90L).map { i =>
      SeriesEvent(i % 3, i, i * 1000L, math.sin(i.toDouble) * 10 +
        rng.nextDouble())
    }
    val chunks = all.grouped(30).toSeq

    // chunk 1: clean drain, instance 1
    chunks(0).toDF().repartition(1).write.mode("append").parquet(s"$dir/in")
    val q1 = startQuery(); q1.processAllAvailable(); q1.stop()

    // chunk 2: RESTART — instance 2 must restore every user's ring +
    // moments from the checkpoint state store
    chunks(1).toDF().repartition(1).write.mode("append").parquet(s"$dir/in")
    val q2 = startQuery(); q2.processAllAvailable(); q2.stop()

    // chunk 3: HARD interrupt — instance 3 starts and is stopped without
    // awaiting progress (its in-flight batch, if any, never commits),
    // then instance 4 drains whatever is left exactly-once
    chunks(2).toDF().repartition(1).write.mode("append").parquet(s"$dir/in")
    val q3 = startQuery(); q3.stop()
    val q4 = startQuery(); q4.processAllAvailable(); q4.stop()

    // truth: the same arrival order through the scalar window
    val expected = all.groupBy(_.userId).flatMap { case (_, evs) =>
      val win = new graft.sax.SaxWindow(n, w, c)
      evs.sortBy(e => (e.ts, e.eventId)).map(e =>
        e.eventId -> win.append(e.value))
    }

    val got = spark.read.parquet(s"$dir/out")
      .select("eventId", "word").as[(Long, String)].collect()
    // exactly-once: one row per event, no replays surviving the kill
    assert(got.length == all.length,
      s"expected ${all.length} rows, got ${got.length}")
    assert(got.toMap == expected)
  }
}
