package graft

import graft.queries.RelQueries
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The q264–q267 interval-analytics family on hand-computed timelines:
  * the sweep-line boundary frame (day clipping, distinct-timestamp
  * collapse), the tie-proof concurrency/coverage arithmetic, the OHLC
  * struct pick under same-timestamp ties, and the OLS slope on an exact
  * line. Synthetic frames feed the SAME production derivations the
  * oracle-gated queries run ([[RelQueries.sweepBoundariesOf]]). */
class IntervalSweepSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val DayUs = 86400000000L

  override def beforeAll(): Unit = {
    spark = graft.SparkUtil.configure(
      SparkSession.builder().master("local[4]"), "4").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** (user, ts_us, event_id) rows → the production boundary frame. */
  private def boundaries(rows: Seq[(Long, Long, Long)]) = {
    val ss = spark; import ss.implicits._
    RelQueries.sweepBoundariesOf(
      rows.toDF("user_id", "ts_us", "event_id"))
  }

  test("sweep boundaries: gap split, day clip, distinct-ts collapse") {
    val h = 3600000000L // SweepGapUs — sessions split on gaps > 1h
    // user 1: events at 0h, 0.5h (one session 0..0.5h), then 10h (its own
    //         point session); user 2: 23.5h .. 24.5h (crosses midnight)
    val b = boundaries(Seq(
      (1L, 0L, 1L), (1L, h / 2, 2L), (1L, 10 * h, 3L),
      (2L, 23 * h + h / 2, 4L), (2L, 24 * h + h / 2, 5L)
    )).orderBy("day", "t").collect()
    // day 0: u1 span [0, 0.5h] + u1 point [10h] + u2 clipped [23.5h, day end]
    // day 1: u2 clipped [day start, 24.5h]
    val day0 = b.filter(_.getLong(0) == 0L)
    val day1 = b.filter(_.getLong(0) == 1L)
    assert(day0.map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSeq ==
      Seq((0L, 1L, 0L), (h / 2, 0L, 1L), (10 * h, 1L, 1L),
        (23 * h + h / 2, 1L, 0L), (DayUs - 1, 0L, 1L)))
    assert(day1.map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSeq ==
      Seq((DayUs, 1L, 0L), (24 * h + h / 2, 0L, 1L)))
  }

  test("peak concurrency is tie-proof: N starts at the SAME instant") {
    val b = boundaries((1L to 5L).map(u => (u, 1000L, u)) ++
      Seq((6L, 2000L, 6L))) // 5 point-sessions at t=1000, 1 at t=2000
    val run = Window.partitionBy("day").orderBy("t")
      .rowsBetween(Window.unboundedPreceding, 0)
    val peak = b.withColumn("conc",
        sum(col("ns") - col("ne")).over(run) + col("ne"))
      .agg(max("conc")).head.getLong(0)
    // the 5 simultaneous single-point sessions all overlap at t=1000;
    // the collapse to one (day, t) row makes that 5 regardless of any
    // tie order inside the window
    assert(peak == 5L)
  }

  test("coverage counts the union once, not the sum of durations") {
    // two heavily-overlapping spans [0, 100s] and [50s, 150s] (one user
    // each, events 1s apart keep each a single session) → union 150s,
    // naive duration sum 200s
    val s = 1000000L
    val b = boundaries(Seq(
      (1L, 0L, 1L), (1L, 100 * s, 2L),
      (2L, 50 * s, 3L), (2L, 150 * s, 4L)))
    val ord = Window.partitionBy("day").orderBy("t")
    val run = ord.rowsBetween(Window.unboundedPreceding, 0)
    val covered = b
      .withColumn("active_after", sum(col("ns") - col("ne")).over(run))
      .withColumn("seg", lead("t", 1).over(ord) - col("t"))
      .agg(coalesce(sum(when(col("active_after") > 0L, col("seg"))),
        lit(0L))).head.getLong(0)
    assert(covered == 150 * s)
  }

  test("OHLC struct pick breaks same-timestamp ties by event_id") {
    val ss = spark; import ss.implicits._
    // three events in one hour for one type, the first two at the SAME
    // microsecond — open must be the lower event_id's value
    val e = Seq(("a", 1L, 0L, 700L), ("a", 2L, 0L, 300L), ("a", 3L, 10L, 500L))
      .toDF("event_type", "event_id", "ts_us", "vq")
    val r = e.groupBy("event_type")
      .agg(min(struct(col("ts_us"), col("event_id"), col("vq")))
          .getField("vq").as("open_c"),
        max(struct(col("ts_us"), col("event_id"), col("vq")))
          .getField("vq").as("close_c"),
        max("vq").as("high_c"), min("vq").as("low_c")).head
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ==
      (700L, 500L, 700L, 300L))
  }

  test("daily trend recovers an exact linear slope") {
    // value rises exactly 3 dollars/day: daily mean mq = day * 3e6
    // micro-units → num/den = 3e6, slope_per_day = 3.0 exactly
    val ss = spark; import ss.implicits._
    val days = (100L to 104L)
    val d = days.map(day => (day, day * 3000000L)).toDF("day", "mq")
    val m = d.groupBy().agg(count(lit(1)).as("n"), sum("day").as("sx"),
      sum("mq").as("sy"), sum(col("day") * col("mq")).as("sxy"),
      sum(col("day") * col("day")).as("sxx")).head
    val (n, sx, sy, sxy, sxx) =
      (m.getLong(0), m.getLong(1), m.getLong(2), m.getLong(3), m.getLong(4))
    val num = n * sxy - sx * sy
    val den = n * sxx - sx * sx
    assert(num % den == 0L && num / den == 3000000L)
  }
}
