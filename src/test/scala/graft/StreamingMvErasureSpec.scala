package graft

import graft.streaming.StreamingMvErasure
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Live MV erasure (the r16 verdict's #5): user-erasure requests
  * applied as they arrive — negated integer partials through the shared
  * merge unit — must serve exactly the MV q306's batch decrement serves
  * (whose oracle separately proves equality with a rebuild from the
  * retained raw events). Duplicates must never double-decrement (the
  * additive-partials hazard: a missed duplicate corrupts every group
  * the user touched), replayed batch ids no-op, and a half-landed
  * users/dec pair stays invisible — including to the duplicate
  * anti-join — until its replay completes. */
object StreamingMvErasureSpec {
  final case class UserReq(user_id: Long)
}

class StreamingMvErasureSpec extends AnyFunSuite with BeforeAndAfterAll {
  import StreamingMvErasureSpec.UserReq

  private var spark: SparkSession = _
  private val dir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = graft.SparkUtil.configure(
      SparkSession.builder().master("local[4]"), "4").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** The events the MV aggregates — the q138 ingested subset. */
  private def ingested() = spark.read.parquet(s"$dir/events.parquet")
    .where(col("event_id") % 10 =!= 0)

  /** The stored base MV, built through the q306 path (which also fixes
    * the ground truth this spec compares against). */
  private def baseMvTable(): String = {
    SparkEntry.queries("q306_erasure_mv_decrement")(spark, dir)
      .queryExecution.toRdd.count()
    s"graft_events_aggmv_${dir.replaceAll("[^A-Za-z0-9]", "_")}"
  }

  /** The q306 purge cohort (user_id % PurgeUserMod == PurgeUserRes) —
    * 1 user at sf0.001, so it anchors the cross-surface equality while
    * [[wideCohort]] (a mod-3 slice, ~1/3 of the users) exercises the
    * multi-batch and duplicate machinery. */
  private def cohort(): Seq[Long] = {
    val ss = spark; import ss.implicits._
    ingested()
      .where(pmod(col("user_id"), lit(graft.queries.RelQueries.PurgeUserMod))
        === graft.queries.RelQueries.PurgeUserRes)
      .select("user_id").distinct().as[Long].collect().sorted.toIndexedSeq
  }

  private def wideCohort(): Seq[Long] = {
    val ss = spark; import ss.implicits._
    ingested().where(pmod(col("user_id"), lit(3L)) === 1L)
      .select("user_id").distinct().as[Long].collect().sorted.toIndexedSeq
  }

  /** The one-shot batch decrement over an arbitrary user set, through
    * the SAME shared units the stream lands through — the ground truth
    * for request sets beyond the q306 fixture. */
  private def batchServe(baseT: String, users: Seq[Long]): Seq[String] = {
    val ss = spark; import ss.implicits._
    mvRows(graft.queries.RelQueries.erasedMvServe(spark.table(baseT),
      graft.queries.RelQueries.negatePartials(
        graft.queries.RelQueries.dayTypePartials(
          ingested().join(broadcast(users.toDF("user_id")),
            Seq("user_id"), "left_semi")))))
  }

  private def mvRows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.orderBy("day", "event_type").collect().map(_.toString).toIndexedSeq

  private def served(baseT: String, outDir: String): Seq[String] =
    mvRows(StreamingMvErasure.servedMv(spark, spark.table(baseT), outDir))

  test("stream-erased MV == the shared-unit batch decrement (duplicates never double-decrement)") {
    val ss = spark; import ss.implicits._
    val baseT = baseMvTable()
    val users = wideCohort()
    assert(users.size >= 4, s"degenerate fixture: only ${users.size} users")
    val outDir = java.nio.file.Files.createTempDirectory("graft-smve-").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-smve-ckpt-").toString
    val stream = MemoryStream[UserReq](spark)
    val q = StreamingMvErasure.start(stream.toDF(), ingested(), outDir, ckpt)
    val chunks = users.grouped(math.max(1, users.size / 4)).toSeq
    chunks.zipWithIndex.foreach { case (chunk, i) =>
      // re-request the previous chunk's tail — the retry-duplicate case;
      // with additive partials a double-decrement would corrupt the MV
      val dupes = if (i > 0) chunks(i - 1).takeRight(2) else Seq.empty
      stream.addData((dupes ++ chunk).map(UserReq.apply))
      q.processAllAvailable()
    }
    q.stop()
    val fromStream = served(baseT, outDir)
    val fromBatch = batchServe(baseT, users)
    assert(fromStream.nonEmpty && fromStream == fromBatch,
      s"stream-erased MV != batch decrement (${fromStream.size} vs ${fromBatch.size} rows)")
  }

  test("streaming exactly the q306 cohort serves exactly q306's MV") {
    val ss = spark; import ss.implicits._
    val baseT = baseMvTable()
    val outDir = java.nio.file.Files.createTempDirectory("graft-smve3-").toString
    cohort().zipWithIndex.foreach { case (u, i) =>
      StreamingMvErasure.writeBatch(Seq(u).toDF("user_id"), ingested(),
        outDir, i.toLong)
    }
    assert(served(baseT, outDir) == mvRows(
      SparkEntry.queries("q306_erasure_mv_decrement")(spark, dir)),
      "stream-erased MV != the q306 batch query")
  }

  test("replayed ids no-op; a half-landed pair is invisible — also to the duplicate anti-join — until completed") {
    val ss = spark; import ss.implicits._
    val baseT = baseMvTable()
    val users = wideCohort()
    val (a, b) = users.splitAt(users.size / 2)
    val outDir = java.nio.file.Files.createTempDirectory("graft-smve2-").toString

    // racing reader before anything landed: the base MV, unchanged
    assert(served(baseT, outDir) ==
      mvRows(graft.queries.RelQueries.erasedMvServe(spark.table(baseT),
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          StreamingMvErasure.decSchema))),
      "an empty store must serve the undecremented MV")

    StreamingMvErasure.writeBatch(a.toDF("user_id"), ingested(), outDir, 0L)
    val after0 = served(baseT, outDir)
    StreamingMvErasure.writeBatch(a.toDF("user_id"), ingested(), outDir, 0L)
    assert(served(baseT, outDir) == after0, "a replayed batch id changed the MV")

    // the crash window: batch 1's user list committed, its decrement
    // absent — serving now must not apply it, and the duplicate
    // anti-join must not count its users as applied (dropping the
    // re-request would lose the erasure forever)
    b.toDF("user_id").write.parquet(s"$outDir/users/batch=1")
    assert(served(baseT, outDir) == after0,
      "a half-landed pair leaked into the served MV")
    // the replay completes batch 1 (same requests, the streaming
    // redelivery order), including users the torn write already listed
    StreamingMvErasure.writeBatch(b.toDF("user_id"), ingested(), outDir, 1L)
    // a later batch re-requests already-erased users: must no-op
    StreamingMvErasure.writeBatch((a.take(2) ++ b.take(2)).toDF("user_id"),
      ingested(), outDir, 2L)
    assert(served(baseT, outDir) == batchServe(baseT, users),
      "completed replay + duplicate re-requests must land the exact batch decrement")
  }

  test("compaction collapses the decrement store; the served MV and replay guarantees survive the roll-up") {
    val ss = spark; import ss.implicits._
    val baseT = baseMvTable()
    val users = wideCohort()
    val outDir = java.nio.file.Files.createTempDirectory("graft-smve4-").toString
    def looseDirs(sub: String) =
      Option(new java.io.File(s"$outDir/$sub").listFiles())
        .map(_.count(_.getName.startsWith("batch="))).getOrElse(0)
    users.zipWithIndex.foreach { case (u, i) =>
      StreamingMvErasure.writeBatch(Seq(u).toDF("user_id"), ingested(),
        outDir, i.toLong)
      if ((i + 1) % 2 == 0) StreamingMvErasure.compact(spark, outDir)
    }
    StreamingMvErasure.compact(spark, outDir)
    StreamingMvErasure.compact(spark, outDir) // GC-lag tick
    Seq("users", "dec").foreach { sub =>
      assert(looseDirs(sub) < users.size,
        s"compaction left ${looseDirs(sub)}/${users.size} loose $sub dirs")
    }
    assert(served(baseT, outDir) == batchServe(baseT, users),
      "the MV served from the compacted store != the batch decrement")
    // a replayed rolled-up batch id must no-op — re-landing it would
    // double-decrement every group its user touched
    val before = served(baseT, outDir)
    StreamingMvErasure.writeBatch(Seq(users.head).toDF("user_id"),
      ingested(), outDir, 0L)
    assert(served(baseT, outDir) == before,
      "a replayed pre-compaction batch id decremented the MV again")
  }
}
