package graft

import graft.queries.MultimodalQueries
import graft.streaming.StreamingMmEncode
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The multimodal leg of the streaming ingestion lifecycle: embedding +
  * cell-assigning blobs against the persisted q297 centroids AS THEY
  * ARRIVE must accumulate exactly the code rows the one-shot q301 batch
  * encode produces (the shared mmEncodeAgainstIndex definition makes the
  * equality exact), and a replayed micro-batch id must not duplicate
  * codes. */
object StreamingMmEncodeSpec {
  final case class Blob(doc_id: Long, payload: Array[Byte])
}

class StreamingMmEncodeSpec extends AnyFunSuite with BeforeAndAfterAll {
  import StreamingMmEncodeSpec.Blob

  private var spark: SparkSession = _
  private val dir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = graft.SparkUtil.configure(
      SparkSession.builder().master("local[4]"), "4").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** The persisted centroid table, built through the q301 path (the same
    * at-rest registry the stream would probe in production). */
  private def centTable(): String = {
    SparkEntry.queries("q301_mm_incremental_encode")(spark, dir)
      .queryExecution.toRdd.count()
    s"graft_mm_cents_${dir.replaceAll("[^A-Za-z0-9]", "_")}"
  }

  private def codeRows(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.select(col("doc_id"), col("cell"), col("emb"))
      .collect().map(_.toString).toSet

  test("streamed blob encode accumulates exactly the batch-encode codes") {
    val ss = spark
    import ss.implicits._
    val centT = centTable()
    // the q301 batch, as raw (doc_id, payload) blob rows
    val batchRows = MultimodalQueries.blobBatch(spark, dir, 4L, 2L)
      .as[Blob].collect().sortBy(_.doc_id)
    assert(batchRows.nonEmpty, "degenerate fixture: no batch blobs")

    val outDir = java.nio.file.Files.createTempDirectory("graft-smm-").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-smm-ckpt-").toString
    val stream = MemoryStream[Blob](spark)
    val q = StreamingMmEncode.start(stream.toDF(), spark.table(centT), outDir, ckpt)
    batchRows.grouped(math.max(1, batchRows.length / 3)).foreach { chunk =>
      stream.addData(chunk.toIndexedSeq); q.processAllAvailable()
    }
    q.stop()

    val streamed = codeRows(StreamingMmEncode.readCodes(spark, outDir))
    val direct = codeRows(MultimodalQueries.mmEncodeAgainstIndex(
      MultimodalQueries.blobBatch(spark, dir, 4L, 2L), spark.table(centT)))
    assert(streamed == direct,
      s"streamed codes != batch codes (${streamed.size} vs ${direct.size} rows)")
    // and the assignment agrees with the q301 oracle surface itself
    val q301 = SparkEntry.queries("q301_mm_incremental_encode")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val streamedCells = StreamingMmEncode.readCodes(spark, outDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamedCells == q301)
  }

  test("a replayed micro-batch id does not duplicate codes") {
    val centT = centTable()
    val one = MultimodalQueries.blobBatch(spark, dir, 4L, 2L).limit(4)
    val outDir = java.nio.file.Files.createTempDirectory("graft-smm2-").toString
    StreamingMmEncode.writeBatch(one, spark.table(centT), outDir, 0L)
    val after1 = StreamingMmEncode.readCodes(spark, outDir).count()
    StreamingMmEncode.writeBatch(one, spark.table(centT), outDir, 0L)
    val after2 = StreamingMmEncode.readCodes(spark, outDir).count()
    assert(after1 == after2, s"replay duplicated codes: $after1 -> $after2")
    assert(after1 > 0)
  }

  test("a probe racing the first micro-batch sees an empty store of the declared schema") {
    val centT = centTable()
    val outDir = java.nio.file.Files.createTempDirectory("graft-smm3-").toString
    def shape(s: org.apache.spark.sql.types.StructType) =
      s.map(f => (f.name, f.dataType))
    val empty = StreamingMmEncode.readCodes(spark, outDir)
    assert(shape(empty.schema) == shape(StreamingMmEncode.storeSchema) &&
      empty.count() == 0L, "nothing-committed read must be an empty store")
    StreamingMmEncode.writeBatch(
      MultimodalQueries.blobBatch(spark, dir, 4L, 2L).limit(4),
      spark.table(centT), outDir, 0L)
    assert(shape(StreamingMmEncode.readCodes(spark, outDir).schema) ==
      shape(StreamingMmEncode.storeSchema),
      "declared store schema drifted from the landed bytes")
  }
}
