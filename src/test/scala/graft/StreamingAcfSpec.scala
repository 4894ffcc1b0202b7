package graft

import graft.queries.RelQueries
import graft.streaming.StreamingAcf
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The streaming correlogram must reproduce the batch q289 report
  * bit-for-bit after replaying the real daily-mean frame in day order,
  * with a ≤7-day ring plus six BIGINTs per lag as the only state. */
class StreamingAcfSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = graft.SparkUtil.configure(
      SparkSession.builder().master("local[4]"), "4").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def drain(rows: Seq[StreamingAcf.DayMean],
                    name: String): Seq[StreamingAcf.AcfOut] = {
    val ss = spark; import ss.implicits._
    val stream = MemoryStream[StreamingAcf.DayMean](spark)
    val q = StreamingAcf.acfStream(stream.toDS())
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    rows.grouped(7).foreach { chunk =>
      stream.addData(chunk.toIndexedSeq); q.processAllAvailable()
    }
    q.stop()
    spark.table(name).as[StreamingAcf.AcfOut].collect().toSeq
  }

  test("planted linear trend: every lag correlates exactly 1.0 live") {
    val rows = (1L to 10L).map(d => StreamingAcf.DayMean("x", d, d * 1000L))
    val out = drain(rows, "acf_planted")
    // lag l first completes a pair on day l+1 and accumulates one per day
    val byLag = out.groupBy(_.lagD)
    assert(byLag.keySet == (1L to 7L).toSet)
    for (l <- 1L to 7L) {
      val rowsL = byLag(l).sortBy(_.day)
      assert(rowsL.head.day == l + 1 && rowsL.last.nDays == 10 - l)
      // a shifted copy of a linear series is a perfect correlate: the
      // integer identity num² = d1·d2 makes r exactly 1.0 from the
      // second pair on (one pair has zero variance → the batch 0.0 guard)
      assert(rowsL.head.r == 0.0 && rowsL.tail.forall(_.r == 1.0),
        s"lag $l: ${rowsL.take(3)}")
    }
    // a gapped series only pairs existing days (batch inner-join parity)
    val gapped = Seq(1L, 2L, 4L, 8L).map(d => StreamingAcf.DayMean("g", d, d))
    val gOut = drain(gapped, "acf_gapped")
    assert(gOut.map(o => (o.lagD, o.day)).toSet ==
      Set((1L, 2L), (2L, 4L), (3L, 4L), (4L, 8L), (6L, 8L), (7L, 8L)))
  }

  test("streaming ACF equals the batch q289 report after replay") {
    val ss = spark; import ss.implicits._
    val dir = "/root/testdata/sf0.001"
    val d = RelQueries.dailyMeans(spark, dir)
      .select("event_type", "day", "mq")
      .as[(String, Long, Long)].collect()
      .sortBy(r => (r._2, r._1))
      .map(r => StreamingAcf.DayMean(r._1, r._2, r._3))
    assert(d.length > 50, "fixture should stream a real daily-mean frame")

    val outs = drain(d.toIndexedSeq, "acf_replay")
    // final correlogram row per (type, lag) == the batch report
    val finals = outs.groupBy(o => (o.eventType, o.lagD)).map {
      case (k, rows) =>
        val last = rows.maxBy(_.day)
        (k, (last.nDays, last.r))
    }
    val batch = RelQueries.acfOf(RelQueries.dailyMeans(spark, dir))
      .select("event_type", "lag_d", "n_days", "r")
      .as[(String, Long, Long, Double)].collect()
      .map(r => ((r._1, r._2), (r._3, r._4))).toMap
    assert(finals == batch,
      s"stream: ${finals.toSeq.sortBy(_._1).take(3)}; " +
        s"batch: ${batch.toSeq.sortBy(_._1).take(3)}")
  }
}
