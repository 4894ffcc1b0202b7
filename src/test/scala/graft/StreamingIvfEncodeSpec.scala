package graft

import graft.streaming.StreamingIvfEncode
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The vector leg of the streaming ingestion lifecycle: encoding
  * embeddings against the persisted index AS THEY ARRIVE must accumulate
  * exactly the code rows the one-shot q129 batch encode produces (the
  * shared encodeAgainstIndex definition makes the equality exact), and a
  * replayed micro-batch id must not duplicate codes. */
object StreamingIvfEncodeSpec {
  final case class Vec(vec_id: Long, embedding: Array[Float])
}

class StreamingIvfEncodeSpec extends AnyFunSuite with BeforeAndAfterAll {
  import StreamingIvfEncodeSpec.Vec

  private var spark: SparkSession = _
  private val dir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = graft.SparkUtil.configure(
      SparkSession.builder().master("local[4]"), "4").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** The pre-batch index tables, built through the q129 path (the same
    * at-rest registry the stream would probe in production). */
  private def indexTables(): (String, String) = {
    SparkEntry.queries("q129_ivf_incremental_encode")(spark, dir)
      .queryExecution.toRdd.count()
    def t(prefix: String) = spark.catalog.listTables()
      .filter(col("name").startsWith(prefix)).collect()(0).name
    (t("graft_ivfb_cents"), t("graft_ivfb_cb"))
  }

  test("streamed encode accumulates exactly the batch-encode codes") {
    val ss = spark
    import ss.implicits._
    val (centT, cbT) = indexTables()
    val batchRows = spark.read.parquet(s"$dir/embeddings.parquet")
      .where(col("vec_id") % 5 === 4)
      .select(col("vec_id"), col("embedding"))
      .as[Vec].collect().sortBy(_.vec_id)
    assert(batchRows.nonEmpty, "degenerate fixture: no batch vectors")

    val outDir = java.nio.file.Files.createTempDirectory("graft-sivf-").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-sivf-ckpt-").toString
    val stream = MemoryStream[Vec](spark)
    val q = StreamingIvfEncode.start(stream.toDF(),
      spark.table(centT), spark.table(cbT), outDir, ckpt)
    batchRows.grouped(math.max(1, batchRows.length / 4)).foreach { chunk =>
      stream.addData(chunk.toIndexedSeq); q.processAllAvailable()
    }
    q.stop()

    val streamed = StreamingIvfEncode.readCodes(spark, outDir)
      .as[(Long, Long, Long, Long)].collect().toSet
    val direct = SparkEntry.queries("q129_ivf_incremental_encode")(spark, dir)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(streamed == direct,
      s"streamed codes != batch codes (${streamed.size} vs ${direct.size} rows)")
  }

  test("a replayed micro-batch id does not duplicate codes") {
    val ss = spark
    import ss.implicits._
    val (centT, cbT) = indexTables()
    val one = spark.read.parquet(s"$dir/embeddings.parquet")
      .where(col("vec_id") % 5 === 4).limit(8)
      .select(col("vec_id"), col("embedding"))
    val outDir = java.nio.file.Files.createTempDirectory("graft-sivf2-").toString
    StreamingIvfEncode.writeBatch(one, spark.table(centT), spark.table(cbT), outDir, 0L)
    val after1 = StreamingIvfEncode.readCodes(spark, outDir).count()
    StreamingIvfEncode.writeBatch(one, spark.table(centT), spark.table(cbT), outDir, 0L)
    val after2 = StreamingIvfEncode.readCodes(spark, outDir).count()
    assert(after1 == after2, s"replay duplicated codes: $after1 -> $after2")
    assert(after1 > 0)
  }

  test("a probe racing the first micro-batch sees an empty store of the declared schema") {
    val (centT, cbT) = indexTables()
    val outDir = java.nio.file.Files.createTempDirectory("graft-sivf3-").toString
    def shape(s: org.apache.spark.sql.types.StructType) =
      s.map(f => (f.name, f.dataType))
    val empty = StreamingIvfEncode.readCodes(spark, outDir)
    assert(shape(empty.schema) == shape(StreamingIvfEncode.storeSchema) &&
      empty.count() == 0L, "nothing-committed read must be an empty store")
    val one = spark.read.parquet(s"$dir/embeddings.parquet")
      .where(col("vec_id") % 5 === 4).limit(4)
      .select(col("vec_id"), col("embedding"))
    StreamingIvfEncode.writeBatch(one, spark.table(centT), spark.table(cbT), outDir, 0L)
    // the constant IS the landed contract — drift here silently changes
    // what racing readers see
    assert(shape(StreamingIvfEncode.readCodes(spark, outDir).schema) ==
      shape(StreamingIvfEncode.storeSchema),
      "declared store schema drifted from the landed bytes")
  }
}
