package graft

import graft.streaming.SketchStreaming
import graft.text.TextHash
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The q108 HLL registers maintained over a STREAM must converge to the
  * batch registers after replaying the same corpus — sketch mergeability
  * in motion — with state bounded by the register count at every point. */
class SketchStreamingSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = graft.SparkUtil.configure(
      SparkSession.builder().master("local[4]"), "4").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("streaming HLL registers equal the batch registers after replay") {
    val ss = spark
    import ss.implicits._
    val shingles = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("text").collect()
      .flatMap(r => TextHash.shingles(TextHash.tokenize(r.getString(0)), 3))
    assert(shingles.length > 1000, "fixture should stream a real corpus")

    val stream = MemoryStream[String](spark)
    val q = SketchStreaming.hllRegisters(stream.toDF(), "value")
      .writeStream.format("memory").queryName("hll_regs")
      .outputMode("complete").start()
    shingles.grouped(2000).foreach { chunk =>
      stream.addData(chunk.toIndexedSeq); q.processAllAvailable()
      // the state bound that makes this runnable forever: never more
      // rows than registers, no matter how much has streamed
      assert(spark.table("hll_regs").count() <= 256)
    }
    q.stop()

    val streamed = spark.table("hll_regs")
      .as[(Long, Int)].collect().toMap
    val batch = graft.queries.DedupQueries
      .hllRegisters(shingles.toSeq.toDF("s"), "s")
      .as[(Long, Int)].collect().toMap
    assert(streamed == batch,
      s"stream-only: ${(streamed.toSet -- batch.toSet).take(3)}; " +
        s"batch-only: ${(batch.toSet -- streamed.toSet).take(3)}")
  }

  test("streaming CMS counters equal the batch counters after replay") {
    val ss = spark
    import ss.implicits._
    val shingles = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("text").collect()
      .flatMap(r => TextHash.shingles(TextHash.tokenize(r.getString(0)), 3))

    val bound = graft.queries.DedupQueries.CmsD * graft.queries.DedupQueries.CmsW
    val stream = MemoryStream[String](spark)
    val q = SketchStreaming.cmsCounters(stream.toDF(), "value")
      .writeStream.format("memory").queryName("cms_ctrs")
      .outputMode("complete").start()
    shingles.grouped(2000).foreach { chunk =>
      stream.addData(chunk.toIndexedSeq); q.processAllAvailable()
      // counts merge under +, so state is never more than d·w counter
      // rows no matter how much has streamed
      assert(spark.table("cms_ctrs").count() <= bound)
    }
    q.stop()

    val streamed = spark.table("cms_ctrs")
      .as[(Int, Int, Long)].collect().map { case (i, p, c) => ((i, p), c) }.toMap
    val batch = graft.queries.DedupQueries
      .cmsCounters(shingles.toSeq.toDF("s"), "s")
      .as[(Int, Int, Long)].collect().map { case (i, p, c) => ((i, p), c) }.toMap
    assert(streamed == batch,
      s"stream-only: ${(streamed.toSet -- batch.toSet).take(3)}; " +
        s"batch-only: ${(batch.toSet -- streamed.toSet).take(3)}")
  }

  test("streaming ddsketch bins equal the batch sketch after replay") {
    val ss = spark
    import ss.implicits._
    // real fixture values PLUS exact zeros: the low store must stream too
    val values = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .select("value").collect().map(_.getDouble(0)) ++ Array(0.0, 0.0, 0.0)

    val stream = MemoryStream[Double](spark)
    val q = SketchStreaming.ddSketchBins(stream.toDF())
      .writeStream.format("memory").queryName("dd_bins")
      .outputMode("complete").start()
    values.grouped(2000).foreach { chunk =>
      stream.addData(chunk.toIndexedSeq); q.processAllAvailable()
      // the fixed log grid bounds state by DYNAMIC RANGE, not row count —
      // the property that makes the quantile monitor runnable forever
      assert(spark.table("dd_bins").count() <= 1000)
    }
    q.stop()

    val streamed = spark.table("dd_bins")
      .as[(Long, Long, Double, Double)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    val batch = graft.queries.RelQueries
      .ddSketch(values.toSeq.toDF("value"))
      .as[(Long, Long, Double, Double)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(streamed == batch,
      s"stream-only: ${(streamed.toSet -- batch.toSet).take(3)}; " +
        s"batch-only: ${(batch.toSet -- streamed.toSet).take(3)}")
    assert(streamed.contains(-1000000L), "zero low store must be present")
  }

  test("streaming centroid sums equal the batch q254 frame after replay") {
    val ss = spark
    import ss.implicits._
    val vecs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select("vec_id", "label", "embedding")
      .as[(Long, Int, Array[Float])].collect()
    assert(vecs.length > 400, "fixture should stream a real embedding table")

    val stream = MemoryStream[(Long, Int, Array[Float])](spark)
    val q = SketchStreaming.centroidSums(
        stream.toDF().toDF("vec_id", "label", "embedding"))
      .writeStream.format("memory").queryName("centroid_sums")
      .outputMode("complete").start()
    val dim = vecs.head._3.length
    vecs.grouped(100).foreach { chunk =>
      stream.addData(chunk.toIndexedSeq); q.processAllAvailable()
      // the state bound: labels × 2 halves × dim rows forever
      assert(spark.table("centroid_sums").count() <= 10L * 2 * dim)
    }
    q.stop()

    val streamed = spark.table("centroid_sums")
      .as[(Int, Long, Int, Long, Long)].collect()
      .map(r => (r._1, r._2, r._3) -> ((r._4, r._5))).toMap
    val batch = graft.queries.VectorQueries
      .centroidSums(vecs.toSeq.toDF("vec_id", "label", "embedding"))
      .as[(Int, Long, Int, Long, Long)].collect()
      .map(r => (r._1, r._2, r._3) -> ((r._4, r._5))).toMap
    assert(streamed == batch,
      s"stream-only: ${(streamed.toSet -- batch.toSet).take(3)}; " +
        s"batch-only: ${(batch.toSet -- streamed.toSet).take(3)}")
  }
}
