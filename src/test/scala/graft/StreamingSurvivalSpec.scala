package graft

import graft.queries.{QueryBase, RelQueries}
import graft.streaming.StreamingSurvival
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The streaming Kaplan–Meier feed replayed over the real events table
  * must reproduce the oracle-gated q290 survival curve bit-identically:
  * the stream's closed-gap and open-interval emissions, driven through
  * the SHARED [[RelQueries.kaplanMeierOf]] level arithmetic, equal the
  * batch report — the survival family's live twin, proven the same way
  * as StreamingAcf/StreamingSessions. */
class StreamingSurvivalSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val dir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = graft.SparkUtil.configure(
      SparkSession.builder().master("local[4]"), "4").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def streamOuts(rows: Seq[StreamingSurvival.SurvEvent],
                         name: String): Seq[StreamingSurvival.SurvOut] = {
    val ss = spark; import ss.implicits._
    val stream = MemoryStream[StreamingSurvival.SurvEvent](spark)
    val q = StreamingSurvival.survivalStream(stream.toDS())
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    rows.grouped(500).foreach { chunk =>
      stream.addData(chunk.toIndexedSeq); q.processAllAvailable()
    }
    q.stop()
    spark.table(name).as[StreamingSurvival.SurvOut].collect().toSeq
  }

  test("streamed gaps + censoring through kaplanMeierOf equal the batch q290 curve") {
    val ss = spark; import ss.implicits._
    val ev = spark.read.parquet(s"$dir/events.parquet")
    val rows = ev.select(ev("user_id"), QueryBase.tsUs(ev).as("ts_us"), ev("event_id"))
      .as[(Long, Long, Long)].collect()
      .sortBy(r => (r._2, r._3)) // the ordered-feed contract
      .map(r => StreamingSurvival.SurvEvent(r._1, r._2, r._3))
    assert(rows.length > 500, "fixture should stream a real event table")

    val outs = streamOuts(rows.toIndexedSeq, "surv_stream")

    // closed gaps: emitted exactly once — d counts per level
    val obs = outs.filter(_.closed).map(_.v)
      .toDF("v").groupBy("v").agg(count(lit(1)).as("d"))
    // open intervals: each user's max-rev row carries its final last-ts
    val umax = outs.filterNot(_.closed)
      .groupBy(_.userId).map { case (_, os) => os.maxBy(_.rev).v }.toSeq
    val gmax = umax.max
    val cens = umax.map(u => (gmax - u) / 1000000L)
      .toDF("v").groupBy("v").agg(count(lit(1)).as("c"))

    val live = RelQueries.kaplanMeierOf(
        obs.join(cens, Seq("v"), "full")
          .select(col("v"), coalesce(col("d"), lit(0L)).as("d"),
            coalesce(col("c"), lit(0L)).as("c")))
      .collect().map(_.toString).toSet
    val batch = graft.SparkEntry.queries("q290_kaplan_meier")(spark, dir)
      .collect().map(_.toString).toSet
    assert(live == batch,
      s"curves diverged; onlyLive=${(live -- batch).take(3)} " +
        s"onlyBatch=${(batch -- live).take(3)}")
  }

  test("survival state survives kill/restart and the curve stays bit-equal") {
    // the StreamingRestartSpec discipline applied to the new module: a
    // durable checkpoint + file source/sink, THREE query instances (one
    // hard-stopped without awaiting progress, so its in-flight batch is
    // uncommitted and must redeliver exactly-once), then the sink's
    // contents drive the same readout as the clean-drain test
    val ss = spark; import ss.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-surv-restart-").toString
    try {
      val rng = new scala.util.Random(7)
      val all = (1L to 90L).map { i =>
        StreamingSurvival.SurvEvent(i % 4, i * 1000000L + rng.nextInt(1000), i)
      }.sortBy(e => (e.ts, e.eventId))
      def startQuery() = {
        val events = spark.readStream
          .schema("userId LONG, ts LONG, eventId LONG")
          .parquet(s"$tmp/in").as[StreamingSurvival.SurvEvent]
        StreamingSurvival.survivalStream(events)
          .writeStream.format("parquet")
          .option("path", s"$tmp/out")
          .option("checkpointLocation", s"$tmp/cp")
          .outputMode("append").start()
      }
      val chunks = all.grouped(30).toSeq
      chunks(0).toDF().repartition(1).write.mode("append").parquet(s"$tmp/in")
      val q1 = startQuery(); q1.processAllAvailable(); q1.stop()
      chunks(1).toDF().repartition(1).write.mode("append").parquet(s"$tmp/in")
      val q2 = startQuery(); q2.processAllAvailable(); q2.stop()
      chunks(2).toDF().repartition(1).write.mode("append").parquet(s"$tmp/in")
      val q3 = startQuery(); q3.stop() // hard interrupt: nothing awaited
      val q4 = startQuery(); q4.processAllAvailable(); q4.stop()

      val outs = spark.read.parquet(s"$tmp/out")
        .as[StreamingSurvival.SurvOut].collect().toSeq
      // exactly-once closed gaps: one per event beyond each user's first
      val users = all.map(_.userId).distinct
      val closed = outs.filter(_.closed).map(_.v)
      assert(closed.length == all.length - users.length,
        s"expected ${all.length - users.length} closed gaps, got ${closed.length}")
      // bit-equal to the scalar replay of the same arrival order
      val want = all.groupBy(_.userId).values.flatMap { evs =>
        evs.sortBy(e => (e.ts, e.eventId)).sliding(2)
          .collect { case Seq(a, b) => (b.ts - a.ts) / 1000000L }
      }.toSeq
      assert(closed.sorted == want.toSeq.sorted,
        "restored state must close the exact same gap multiset")
      // open rows: the max-rev row per user carries that user's true
      // final timestamp across both restarts and the uncommitted batch
      val umax = outs.filterNot(_.closed)
        .groupBy(_.userId).map { case (u, os) => u -> os.maxBy(_.rev).v }
      val wantLast = all.groupBy(_.userId)
        .map { case (u, evs) => u -> evs.map(_.ts).max }
      assert(umax == wantLast)
    } finally graft.queries.AtRestTables.deleteRecursively(tmp)
  }

  test("gaps close across batch boundaries with O(1) per-user state") {
    // one user fed across THREE batches: each arrival after the first
    // closes exactly one gap; the open row re-emits with a rising rev
    val u = 42L
    val s = 1000000L // 1 second in µs
    val b1 = Seq(StreamingSurvival.SurvEvent(u, 0L, 1L))
    val b2 = Seq(StreamingSurvival.SurvEvent(u, 3L * s, 2L),
                 StreamingSurvival.SurvEvent(u, 3L * s, 3L)) // 0-gap tie
    val b3 = Seq(StreamingSurvival.SurvEvent(u, 10L * s, 4L))
    val ss2 = spark
    val stream = MemoryStream[StreamingSurvival.SurvEvent](spark)(
      ss2.implicits.newProductEncoder)
    val q = StreamingSurvival.survivalStream(stream.toDS())
      .writeStream.format("memory").queryName("surv_incr")
      .outputMode("append").start()
    Seq(b1, b2, b3).foreach { b => stream.addData(b); q.processAllAvailable() }
    q.stop()
    import ss2.implicits._
    val outs = spark.table("surv_incr")
      .as[StreamingSurvival.SurvOut].collect().sortBy(_.rev)
    val closed = outs.filter(_.closed).map(_.v).toSeq
    assert(closed == Seq(3L, 0L, 7L),
      s"expected gaps 3/0/7 closed across the batch boundaries, got $closed")
    val opens = outs.filterNot(_.closed).map(_.v).toSeq
    assert(opens == Seq(0L, 3L * s, 10L * s),
      "open rows must track the user's latest timestamp per batch")
    assert(outs.map(_.rev).toSeq == outs.map(_.rev).distinct.toSeq.sorted,
      "revisions must rise strictly so replays pick the final open row")
  }
}
