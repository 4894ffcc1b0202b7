package graft

import graft.queries.RelQueries
import graft.streaming.StreamingDrift
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The streaming Page–Hinkley monitor must reproduce the batch q280
  * report bit-for-bit after replaying the real daily-mean frame in day
  * order, with six longs of state per type. */
class StreamingDriftSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = graft.SparkUtil.configure(
      SparkSession.builder().master("local[4]"), "4").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def drain(rows: Seq[StreamingDrift.DayMean],
                    name: String): Seq[StreamingDrift.PhOut] = {
    val ss = spark; import ss.implicits._
    val stream = MemoryStream[StreamingDrift.DayMean](spark)
    val q = StreamingDrift.phStream(stream.toDS())
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    rows.grouped(7).foreach { chunk =>
      stream.addData(chunk.toIndexedSeq); q.processAllAvailable()
    }
    q.stop()
    spark.table(name).as[StreamingDrift.PhOut].collect().toSeq
  }

  test("planted level shift: alarm fires live on the shifted day") {
    val rows = (1L to 3L).map(d => StreamingDrift.DayMean("x", d, 0L)) ++
      (4L to 6L).map(d => StreamingDrift.DayMean("x", d, 1000000L))
    val out = drain(rows, "ph_planted").sortBy(_.day)
    assert(out.map(_.alarmDay) == Seq(-1L, -1L, -1L, 4L, 4L, 4L))
    assert(out.last.maxDev == 183.5)
    assert(out.take(3).forall(_.dev == 0.0))
  }

  test("streaming PH equals the batch q280 report after replay") {
    val ss = spark; import ss.implicits._
    val dir = "/root/testdata/sf0.001"
    val d = RelQueries.dailyMeans(spark, dir)
      .select("event_type", "day", "mq")
      .as[(String, Long, Long)].collect()
      .sortBy(r => (r._2, r._1))
      .map(r => StreamingDrift.DayMean(r._1, r._2, r._3))
    assert(d.length > 50, "fixture should stream a real daily-mean frame")

    val outs = drain(d.toIndexedSeq, "ph_replay")
    // final monitor row per type == the batch report
    val finals = outs.groupBy(_.eventType).map { case (et, rows) =>
      val last = rows.maxBy(_.day)
      (et, (last.nDays, last.maxDev, last.alarmDay))
    }
    val batch = RelQueries.pageHinkleyOf(RelQueries.dailyMeans(spark, dir))
      .select("event_type", "n_days", "max_dev", "alarm_day")
      .as[(String, Long, Double, Long)].collect()
      .map(r => (r._1, (r._2, r._3, r._4))).toMap
    assert(finals == batch,
      s"stream: ${finals.toSeq.sortBy(_._1).take(3)}; " +
        s"batch: ${batch.toSeq.sortBy(_._1).take(3)}")
    // one emitted row per (type, day)
    assert(outs.length == d.length)
  }
}
