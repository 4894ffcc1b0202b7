package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** QueryBase.tsUs is the single time-arithmetic dispatch point (r10 lost
  * 28 queries to a hand-written `ts div 1000` when the carrier type
  * changed). Pin: both carriers — TIMESTAMP_NTZ wall-clock and legacy
  * integer-ns Long — yield the SAME epoch-µs integers, and the µs values
  * match DuckDB's epoch_us convention (UTC session). */
class TsUsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = graft.SparkUtil.configure(
      SparkSession.builder().master("local[2]"), "2").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("timestamp and integer-ns carriers produce identical epoch-µs") {
    val ss = spark
    import ss.implicits._
    // µs magnitudes around the testdata's 2024 epoch, incl. a sub-ms tie
    val us = Seq(1700000000000000L, 1700000000000001L, 1712345678901234L, 0L)
    val asLongNs = us.map(_ * 1000L).toDF("ts") // legacy integer-ns carrier
    val asTs = us.toDF("us")
      .select(timestamp_micros(col("us")).cast("timestamp_ntz").as("ts"))
    val a = asLongNs.select(graft.queries.QueryBase.tsUs(asLongNs).as("u"))
      .as[Long].collect().toSeq.sorted
    val b = asTs.select(graft.queries.QueryBase.tsUs(asTs).as("u"))
      .as[Long].collect().toSeq.sorted
    assert(a == us.sorted, s"long-ns branch: $a")
    assert(b == us.sorted, s"timestamp branch: $b")
  }

  test("unsupported carrier types are rejected at dispatch, not at runtime") {
    val ss = spark
    import ss.implicits._
    val bad = Seq("2024-01-01").toDF("ts")
    assertThrows[IllegalArgumentException] {
      graft.queries.QueryBase.tsUs(bad)
    }
  }
}
