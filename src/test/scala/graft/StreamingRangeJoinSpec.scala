package graft

import graft.streaming.StreamingRangeJoin
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The watermarked stream-stream range join must emit exactly the batch
  * pair set after an in-order replay (lateness ≥ τ, so nothing is late),
  * while the watermark keeps the join state bounded by the horizon — the
  * streaming face of q119's bucketed range join. */
class StreamingRangeJoinSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = graft.SparkUtil.configure(
      SparkSession.builder().master("local[4]"), "4").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("streaming range-join pairs equal the batch pairs after in-order replay") {
    val ss = spark
    import ss.implicits._
    val tauSec = StreamingRangeJoin.DefaultTauSec // q119's RangeTauUs, via the shared constant
    // replay in ns-long form (the MemoryStream tuple type); tsUs handles
    // either carrier, so the ns longs exercise the legacy branch while the
    // batch side below could equally feed the raw timestamp frame
    val rows = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .select(org.apache.spark.sql.functions.col("event_id"),
        org.apache.spark.sql.functions.col("user_id"),
        (org.apache.spark.sql.functions.unix_micros(
          org.apache.spark.sql.functions.col("ts")
            .cast(org.apache.spark.sql.types.TimestampType)) * 1000L).as("ts"))
      .orderBy("ts", "event_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.length == 1000)

    val stream = MemoryStream[(Long, Long, Long)](spark)
    val q = StreamingRangeJoin.pairs(
        stream.toDF().toDF("event_id", "user_id", "ts"), tauSec, "2 hours")
      .writeStream.format("memory").queryName("rj_pairs")
      .outputMode("append").start()
    rows.grouped(100).foreach { chunk =>
      stream.addData(chunk.toIndexedSeq); q.processAllAvailable()
    }
    // the bound that makes this runnable forever: the stream spans ~719
    // hours, and state holds only rows inside the τ + lateness horizon —
    // far fewer than the 2 × 1000 rows a history-keeping join would pin
    val stateRows = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
    assert(stateRows > 0 && stateRows < 1000,
      s"join state $stateRows rows — watermark eviction not happening")
    q.stop()

    val streamed = spark.table("rj_pairs")
      .as[(Long, Long)].collect().toSet
    val batch = StreamingRangeJoin.pairs(
        rows.toSeq.toDF("event_id", "user_id", "ts"), tauSec, "2 hours")
      .as[(Long, Long)].collect().toSet
    assert(batch.nonEmpty)
    assert(streamed == batch,
      s"stream-only: ${(streamed -- batch).take(3)}; batch-only: ${(batch -- streamed).take(3)}")
  }
}
