package graft

import graft.streaming.MvMaintenance
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The aggregate leg of the event-store lifecycle: streaming MV
  * maintenance must converge to EXACTLY the direct batch aggregate —
  * the integer partials (the shared q138 dayTypePartials definition)
  * make the replay equality bit-exact, not approximate — and a replayed
  * batch id (foreachBatch's at-least-once) must be a no-op. */
object MvMaintenanceSpec {
  // integer-ns ts exercises the legacy tsUs dispatch arm; the parquet
  // events table (timestamp[us]) exercises the other in the batch half.
  // Top-level (companion) so the encoder needs no outer scope.
  final case class MvEvent(ts: Long, event_type: String, value: Double)
}

class MvMaintenanceSpec extends AnyFunSuite with BeforeAndAfterAll {
  import MvMaintenanceSpec.MvEvent

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = graft.SparkUtil.configure(
      SparkSession.builder().master("local[4]"), "4").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("streamed MV merges converge to the direct batch aggregate") {
    val ss = spark
    import ss.implicits._
    val src = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val rows = src
      .select(graft.queries.QueryBase.tsUs(src).as("us"),
        col("event_type"), col("value"))
      .as[(Long, String, Double)].collect()
      .map { case (us, t, v) => MvEvent(us * 1000L, t, v) }
      .sortBy(_.ts)

    val mvDir = java.nio.file.Files.createTempDirectory("graft-mv-").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-mv-ckpt-").toString
    val stream = MemoryStream[MvEvent](spark)
    val q = MvMaintenance.daily(stream.toDF(), mvDir, ckpt)
    rows.grouped(1200).foreach { chunk =>
      stream.addData(chunk.toIndexedSeq); q.processAllAvailable()
    }
    q.stop()

    val mv = MvMaintenance.readMv(spark, mvDir)
      .getOrElse(fail("no MV written"))
      .select(col("day").cast("long"), col("event_type"), col("n"), col("s"))
      .as[(Long, String, Long, Long)].collect().toSet
    val direct = graft.queries.RelQueries.dayTypePartials(src)
      .select(col("day").cast("long"), col("event_type"), col("n"), col("s"))
      .as[(Long, String, Long, Long)].collect().toSet
    assert(mv == direct, "streamed MV != direct batch partials")
    assert(mv.nonEmpty && mv.map(_._1).size > 10, "degenerate fixture")

    // at most two version dirs survive (current + one superseded)
    val versions = new java.io.File(mvDir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("v"))
    assert(versions.length <= 2, s"version GC kept ${versions.length} dirs")
  }

  test("a replayed batch id is a no-op (exactly-once under at-least-once)") {
    val ss = spark
    import ss.implicits._
    val mvDir = java.nio.file.Files.createTempDirectory("graft-mv2-").toString
    val batch = Seq(MvEvent(1000L, "a", 1.5), MvEvent(2000L, "b", 2.5)).toDF()
    MvMaintenance.mergeBatch(batch, mvDir, 0L)
    val after1 = MvMaintenance.readMv(spark, mvDir).get
      .as[(Long, String, Long, Long)].collect().toSet
    MvMaintenance.mergeBatch(batch, mvDir, 0L) // replay
    val after2 = MvMaintenance.readMv(spark, mvDir).get
      .as[(Long, String, Long, Long)].collect().toSet
    assert(after1 == after2, "replayed batch double-merged")
    MvMaintenance.mergeBatch(batch, mvDir, 1L) // a genuinely new batch merges
    val after3 = MvMaintenance.readMv(spark, mvDir).get
      .select(sum("n")).as[Long].collect()(0)
    assert(after3 == 4L, s"new batch did not merge (total n = $after3)")
  }
}
