package graft

import graft.streaming.StreamingAttribution
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** q318's live twin: attributing documents to their first failing
  * pipeline gate AS THEY ARRIVE must reproduce the oracle-gated batch
  * report bit-exactly after an in-order replay (shared feature
  * projection, shared gate, shared stage chain, shared report
  * aggregation — the equality is by construction, this spec proves the
  * construction), a replayed micro-batch id must no-op, a half-landed
  * batch must stay invisible, and the generational roll-up must change
  * nothing a reader sees. */
object StreamingAttributionSpec {
  final case class Doc(doc_id: Long, text: String)
}

class StreamingAttributionSpec extends AnyFunSuite with BeforeAndAfterAll {
  import StreamingAttributionSpec.Doc

  private var spark: SparkSession = _
  private val dir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = graft.SparkUtil.configure(
      SparkSession.builder().master("local[4]"), "4").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def docs(): DataFrame = spark.read
    .parquet(s"$dir/documents.parquet").select(col("doc_id"), col("text"))

  private def batchReport(): Set[(String, String, Long, Long, Double)] =
    collectReport(SparkEntry.queries("q318_pipeline_attribution")(spark, dir))

  private def collectReport(df: DataFrame)
      : Set[(String, String, Long, Long, Double)] = {
    val ss = spark
    import ss.implicits._
    df.select(col("stage"), col("pred_lang"), col("n_docs"),
        col("ws_tokens"), col("share"))
      .as[(String, String, Long, Long, Double)].collect().toSet
  }

  test("in-order streamed attribution reproduces the batch q318 report bit-exactly") {
    val ss = spark
    import ss.implicits._
    val rows = docs().as[Doc].collect().sortBy(_.doc_id)
    assert(rows.nonEmpty, "degenerate fixture: no documents")

    val outDir = java.nio.file.Files.createTempDirectory("graft-satt-").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-satt-ckpt-").toString
    val stream = MemoryStream[Doc](spark)
    val q = StreamingAttribution.start(stream.toDF(), outDir, ckpt)
    rows.grouped(math.max(1, rows.length / 4)).foreach { chunk =>
      stream.addData(chunk.toIndexedSeq); q.processAllAvailable()
    }
    q.stop()

    val streamed = collectReport(StreamingAttribution.report(spark, outDir))
    val batch = batchReport()
    assert(streamed == batch,
      s"streamed attribution report != batch q318 report\n" +
        s"streamed: ${streamed.toSeq.sorted.mkString("; ")}\n" +
        s"batch:    ${batch.toSeq.sorted.mkString("; ")}")
    // exactly one attribution row per document
    assert(StreamingAttribution.readAttribution(spark, outDir).count() ==
      rows.length.toLong)
  }

  test("replayed ids no-op, torn batches stay invisible, roll-up changes nothing") {
    val ss = spark
    import ss.implicits._
    val rows = docs().as[Doc].collect().sortBy(_.doc_id)
    val outDir = java.nio.file.Files.createTempDirectory("graft-satt2-").toString
    val chunks = rows.grouped(math.max(1, rows.length / 3)).toSeq
    chunks.zipWithIndex.foreach { case (c, i) =>
      StreamingAttribution.writeBatch(c.toSeq.toDF("doc_id", "text"), outDir, i.toLong)
    }
    val before = collectReport(StreamingAttribution.report(spark, outDir))
    assert(before == batchReport(), "direct writeBatch replay != batch report")

    // an applied id replays as a no-op (at-least-once foreachBatch)
    StreamingAttribution.writeBatch(
      chunks.head.toSeq.toDF("doc_id", "text"), outDir, 0L)
    assert(collectReport(StreamingAttribution.report(spark, outDir)) == before,
      "replaying a committed batch id changed the served report")

    // a half-landed batch (att without ecan/ncan) is invisible: the
    // fully-landed id set is the all-parts intersection
    chunks.head.take(5).toSeq.toDF("doc_id", "text")
      .withColumn("stage", lit("5_kept"))
      .withColumn("pred_lang", lit("en"))
      .withColumn("n_tokens", lit(1))
      .select("doc_id", "stage", "pred_lang", "n_tokens")
      .write.parquet(s"$outDir/att/batch=99")
    assert(collectReport(StreamingAttribution.report(spark, outDir)) == before,
      "a torn batch leaked into the served report")

    // generational roll-up: same report, and a covered id still no-ops
    val cover = StreamingAttribution.compactStore(spark, outDir)
    assert(cover.exists(_ >= 2L), s"roll-up did not cover the landed batches: $cover")
    assert(collectReport(StreamingAttribution.report(spark, outDir)) == before,
      "compaction changed the served report")
    StreamingAttribution.writeBatch(
      chunks(1).toSeq.toDF("doc_id", "text"), outDir, 1L)
    assert(collectReport(StreamingAttribution.report(spark, outDir)) == before,
      "replaying a rolled-up batch id changed the served report")
  }

  test("arrival order shifts canonical election but never the gate counts") {
    val ss = spark
    import ss.implicits._
    // reversed arrival: stages 1/2 are per-doc (order-free), and the
    // exact-dup TOTAL is order-free too (each hash group always yields
    // size-1 duplicates); only which doc is canonical — and through the
    // simhash of that elected doc, the near-dup split — may move
    val rows = docs().as[Doc].collect().sortBy(-_.doc_id)
    val outDir = java.nio.file.Files.createTempDirectory("graft-satt3-").toString
    rows.grouped(math.max(1, rows.length / 3)).zipWithIndex.foreach {
      case (c, i) =>
        StreamingAttribution.writeBatch(c.toSeq.toDF("doc_id", "text"), outDir, i.toLong)
    }
    def stageCounts(s: Set[(String, String, Long, Long, Double)]): Map[String, Long] =
      s.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val rev = stageCounts(collectReport(StreamingAttribution.report(spark, outDir)))
    val fwd = stageCounts(batchReport())
    for (st <- Seq("1_language", "2_quality", "3_exact_dup"))
      assert(rev.getOrElse(st, 0L) == fwd.getOrElse(st, 0L),
        s"stage $st count moved under reversed arrival: $rev vs $fwd")
    assert(rev.values.sum == fwd.values.sum, "total attributed docs moved")
  }
}
