package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** q315's ordering and fault contracts (the AtRestFaultSpec discipline
  * applied to the executed user-estate remediation):
  *
  *  - the deletion vector's retirement is the LAST write of the
  *    remediation build — retiring it first would lose the only record
  *    of which keys the pending rewrites must drop;
  *  - a build killed at the `eraserem2:dvgate` window (every rewrite
  *    landed, retirement not yet written) leaves the LIVE deletion
  *    vector intact and the retired store unpublished — the re-run then
  *    converges to the clean remediated estate bit-for-bit;
  *  - a build killed in an EARLY window publishes nothing and recovers.
  */
class EstateRemediationSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var base: String = _

  override def beforeAll(): Unit = {
    spark = graft.SparkUtil.configure(
      SparkSession.builder().master("local[4]"), "4").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    base = java.nio.file.Files.createTempDirectory("graft-remspec-").toString
  }

  override def afterAll(): Unit = {
    if (spark != null) spark.stop()
    graft.queries.AtRestTables.deleteRecursively(base)
  }

  private def dataDir(tag: String): String = {
    val d = s"$base/data_$tag"
    new java.io.File(d).mkdirs()
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      java.nio.file.Paths.get(s"$d/events.parquet"))
    d
  }

  private def probe(d: String) =
    graft.queries.RelQueries.defs("q315_user_estate_remediation")(spark, d)

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.orderBy("artifact").collect().map(_.toString).toIndexedSeq

  test("the remediation's write order ends with the dv retirement gate") {
    val seen = scala.collection.mutable.ArrayBuffer[String]()
    graft.queries.AtRestTables.faultHook =
      t => if (t.startsWith("eraserem2:")) seen += t
    try probe(dataDir("order")).collect()
    finally graft.queries.AtRestTables.faultHook = _ => ()
    assert(seen.toSeq == Seq("eraserem2:z", "eraserem2:ranged",
      "eraserem2:g1", "eraserem2:g2", "eraserem2:hll", "eraserem2:v3",
      "eraserem2:snap", "eraserem2:dvgate"),
      s"remediation write order drifted: $seen")
  }

  test("killed at the dv gate: every rewrite landed but the vector stays LIVE; the re-run retires it") {
    val d = dataDir("dvgate")
    val sfx = d.replaceAll("[^A-Za-z0-9]", "_")
    graft.queries.AtRestTables.faultHook = t =>
      if (t == "eraserem2:dvgate") throw new RuntimeException(s"kill at $t")
    try {
      val ex = intercept[RuntimeException] { probe(d).collect() }
      assert(ex.getMessage.contains("kill at eraserem2:dvgate"))
    } finally graft.queries.AtRestTables.faultHook = _ => ()
    // the retirement did NOT happen: no retired store, and the live
    // deletion vector still carries its flagged keys
    assert(!spark.catalog.tableExists(s"graft_rem_dv_$sfx"),
      "a killed build must not publish the retired dv store")
    assert(spark.table(s"graft_purge_dv_$sfx").count() > 0,
      "the LIVE deletion vector must survive a pre-retirement kill")
    // the re-run converges to the clean remediated estate
    val expected = rows(probe(dataDir("clean")))
    assert(rows(probe(d)) == expected,
      "recovery after the dv-gate kill must equal the clean remediation")
    assert(spark.table(s"graft_rem_dv_$sfx").count() == 0,
      "the recovered build must retire the vector (empty store)")
  }

  test("killed in the first window publishes nothing; the re-run recovers") {
    val d = dataDir("zkill")
    val sfx = d.replaceAll("[^A-Za-z0-9]", "_")
    graft.queries.AtRestTables.faultHook = t =>
      if (t == "eraserem2:z") throw new RuntimeException(s"kill at $t")
    try intercept[RuntimeException] { probe(d).collect() }
    finally graft.queries.AtRestTables.faultHook = _ => ()
    assert(!spark.catalog.tableExists(s"graft_rem_dv_$sfx"),
      "an early kill must leave the whole remediated estate unpublished")
    val expected = rows(probe(dataDir("clean2")))
    val got = rows(probe(d))
    assert(got == expected && got.nonEmpty,
      "recovery after an early kill must equal the clean remediation")
  }
}
