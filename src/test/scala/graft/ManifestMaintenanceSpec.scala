package graft

import graft.streaming.ManifestMaintenance
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The q141 zone-map lifecycle's maintenance half: incremental manifest
  * updates must (a) scan only files the manifest doesn't know, and
  * (b) converge to exactly the from-scratch rebuild — so a layout that
  * grows by appended files keeps skip-correct stats without ever
  * rescanning history. */
class ManifestMaintenanceSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var base: String = _

  override def beforeAll(): Unit = {
    spark = graft.SparkUtil.configure(
      SparkSession.builder().master("local[4]"), "4").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    base = java.nio.file.Files.createTempDirectory("graft-manifest-spec-").toString
  }

  override def afterAll(): Unit = {
    if (spark != null) spark.stop()
    graft.queries.AtRestTables.deleteRecursively(base)
  }

  private def layout = s"$base/layout"
  private def manifest = s"$base/manifest"

  private def writeWave(ids: Range): Unit = {
    // one file per write (coalesce(1)), append — a micro-batch's worth
    spark.range(ids.start, ids.end)
      .select(col("id").as("user_id"), (col("id") % 7).as("v"))
      .coalesce(1).write.mode("append").parquet(layout)
  }

  test("incremental updates scan only new files and converge to rebuild") {
    writeWave(0 until 100)
    writeWave(100 until 250)
    val n1 = ManifestMaintenance.update(spark, layout, manifest)
    assert(n1 == 2, s"first update saw $n1 files, wanted the 2 written")
    assert(ManifestMaintenance.update(spark, layout, manifest) == 0,
      "current manifest must be a no-op update")

    writeWave(250 until 400) // a third file lands later
    val n2 = ManifestMaintenance.update(spark, layout, manifest)
    assert(n2 == 1, s"second update saw $n2 files, wanted only the new one")

    val got = spark.read.parquet(manifest)
      .orderBy("file").collect().map(_.toString).toSeq
    val want = ManifestMaintenance.rebuild(spark, layout)
      .orderBy("file").collect().map(_.toString).toSeq
    assert(got == want, s"incremental manifest diverges from rebuild:\n$got\n$want")
    assert(got.size == 3, s"expected 3 manifest rows, got ${got.size}")
  }

  test("maintained manifest prunes a probe to the matching files only") {
    // rows 0..399 across 3 files with disjoint ranges — a window inside
    // the middle file must open exactly one file
    val man = spark.read.parquet(manifest)
    val hit = man.where(col("max_user_id") >= 120 && col("min_user_id") <= 180)
      .select("file").collect().map(_.getString(0))
    assert(hit.length == 1, s"window [120,180] should hit 1 file, hit ${hit.length}")
    val rows = spark.read.parquet(hit: _*)
      .where(col("user_id") >= 120 && col("user_id") <= 180).count()
    assert(rows == 61, s"pruned probe returned $rows rows, wanted 61")
  }
}
