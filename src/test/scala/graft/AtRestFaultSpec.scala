package graft

import graft.streaming.{ManifestMaintenance, PartitionedIngest}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Fault-path verification for the AT-REST maintenance half (the
  * [[StreamingRestartSpec]] counterpart for files instead of state): a
  * maintenance job killed mid-write must never corrupt the serving
  * layout, and a re-run must converge to the clean result.
  *
  *  - compaction: [[PartitionedIngest.compactDaily]] writes to a FRESH
  *    path, so a kill leaves the observable crash end-state — a partial
  *    day subset, leftover `_temporary`, NO `_SUCCESS` marker — while the
  *    source layout stays untouched. The spec builds exactly that
  *    end-state, asserts the atomic-swap precondition (`_SUCCESS` absent
  *    → the pointer must not flip), and proves a re-run converges:
  *    content identical to the source, one file per day, no trash.
  *  - manifest upkeep: a killed [[ManifestMaintenance.update]] append
  *    leaves only uncommitted `_temporary` trash (the commit protocol
  *    publishes nothing) — including on a FIRST-EVER update, where the
  *    manifest directory then exists with no committed files; the next
  *    update must treat it as absent instead of failing to read it, and
  *    re-runs must stay duplicate-free and rebuild-identical.
  */
class AtRestFaultSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var base: String = _

  override def beforeAll(): Unit = {
    spark = graft.SparkUtil.configure(
      SparkSession.builder().master("local[4]"), "4").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    base = java.nio.file.Files.createTempDirectory("graft-atrest-fault-").toString
  }

  override def afterAll(): Unit = {
    if (spark != null) spark.stop()
    graft.queries.AtRestTables.deleteRecursively(base)
  }

  /** The observable end-state of a job killed mid-write under Spark's
    * commit protocol: uncommitted task trash, no success marker. */
  private def plantCrashDebris(path: String): Unit = {
    new java.io.File(s"$path/_temporary/0").mkdirs()
    new java.io.File(s"$path/_SUCCESS").delete()
  }

  private def daily(ids: Range, wave: Int): Unit =
    spark.range(ids.start, ids.end)
      .select(col("id").as("event_id"), (col("id") % 5).as("day"),
        (col("id") * wave).as("v"))
      .coalesce(2).write.mode("append").partitionBy("day")
      .parquet(s"$base/ingested")

  test("a killed compaction cannot corrupt the layout; the re-run converges") {
    daily(0 until 200, 1); daily(200 until 500, 2) // multi-file days
    val in = s"$base/ingested"
    val out = s"$base/compacted"
    val srcRows = spark.read.parquet(in).count()

    // crash end-state: a partial compaction (2 of 5 days), trash, no marker
    spark.read.parquet(in).where(col("day") < 2)
      .repartition(col("day"))
      .write.mode("overwrite").partitionBy("day").parquet(out)
    plantCrashDebris(out)

    // the serving side is safe: source untouched, and the atomic-swap
    // precondition correctly refuses the partial output
    assert(spark.read.parquet(in).count() == srcRows)
    assert(!new java.io.File(s"$out/_SUCCESS").exists(),
      "partial output must not carry the success marker")

    // re-run converges: content identity, one file per day, no trash
    PartitionedIngest.compactDaily(spark, in, out)
    val got = spark.read.parquet(out)
      .select("event_id", "day", "v").orderBy("event_id")
      .collect().map(_.toString).toSeq
    val want = spark.read.parquet(in)
      .select("event_id", "day", "v").orderBy("event_id")
      .collect().map(_.toString).toSeq
    assert(got == want)
    assert(new java.io.File(s"$out/_SUCCESS").exists())
    assert(!new java.io.File(s"$out/_temporary").exists(),
      "recovered layout must not retain crash debris")
    for (d <- 0 until 5) {
      val files = Option(new java.io.File(s"$out/day=$d").listFiles())
        .map(_.count(f => f.getName.endsWith(".parquet"))).getOrElse(0)
      assert(files == 1, s"day=$d holds $files files after compaction")
    }
  }

  test("a killed at-rest index build publishes nothing; probes rebuild and converge") {
    // The q127/q297 nightly-build lifecycle under a mid-flight kill: the
    // build closure writes centroids, then dies before the cell-bucketed
    // code table lands — exactly the crash window of the real
    // ivfIndexTables/mmIndexTables three-write sequence (spec-owned table
    // names so the real per-dataset registrations are untouched).
    val ss = spark; import ss.implicits._
    def cents() = Seq((0L, 10L), (5L, 20L)).toDF("cent_id", "v")
    def codes() = (0L until 40L).map(i => (i, i % 2 * 5L, i * 3L))
      .toDF("vec_id", "cell", "code")
    var builds = 0
    def build(kill: Boolean)(base: String): Seq[String] = {
      builds += 1
      cents().write.mode("overwrite")
        .option("path", s"$base/cents").saveAsTable("graft_faultidx_cents")
      if (kill) throw new RuntimeException("simulated mid-build kill")
      codes().write.mode("overwrite").option("path", s"$base/codes")
        .bucketBy(2, "cell").sortBy("cell").saveAsTable("graft_faultidx_codes")
      Seq("graft_faultidx_cents", "graft_faultidx_codes")
    }

    // the kill: get() must propagate, and must NOT memoize the entry
    val ex = intercept[RuntimeException] {
      graft.queries.AtRestTables.get(spark, "faultidx|spec")(build(kill = true))
    }
    assert(ex.getMessage.contains("simulated mid-build kill"))
    // crash debris IS real — the partial centroid table got registered —
    // but the serving path never reads table names outside the registry,
    // and the registry refuses to serve: the next access re-enters the
    // build instead of returning the partial artifact
    assert(spark.catalog.tableExists("graft_faultidx_cents"),
      "the crash window leaves a committed first write (that's the hazard)")
    assert(!spark.catalog.tableExists("graft_faultidx_codes"))

    val names = graft.queries.AtRestTables.get(spark, "faultidx|spec")(build(kill = false))
    assert(builds == 2, "the re-run must rebuild, not serve the partial entry")
    assert(names == Seq("graft_faultidx_cents", "graft_faultidx_codes"))

    // convergence: the recovered layout equals the clean frames, the
    // bucketed table serves with its bucket spec intact, and a THIRD
    // access is a pure memo hit (no rebuild)
    val gotCents = spark.table(names(0)).orderBy("cent_id")
      .collect().map(_.toString).toSeq
    assert(gotCents == cents().orderBy("cent_id").collect().map(_.toString).toSeq)
    val gotCodes = spark.table(names(1)).orderBy("vec_id")
      .collect().map(_.toString).toSeq
    assert(gotCodes == codes().orderBy("vec_id").collect().map(_.toString).toSeq)
    // a bare filter scan has no distribution-requiring operator, so the
    // auto-bucketed-scan rule would hide the bucket layout ("Bucketed:
    // false (disabled by query planner)") — pin the pruning with the
    // rule off, which is how a probe-shaped join plan reads it anyway
    val auto = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    val prev = spark.conf.get(auto)
    try {
      spark.conf.set(auto, "false")
      val scan = spark.table(names(1)).where(col("cell") === 5L)
        .queryExecution.executedPlan.toString
      assert(scan.contains("SelectedBucketsCount"),
        s"recovered code table must still bucket-prune:\n$scan")
    } finally spark.conf.set(auto, prev)
    graft.queries.AtRestTables.get(spark, "faultidx|spec")(build(kill = false))
    assert(builds == 2, "a clean entry must serve from the memo")
  }

  /** A spec-owned data dir holding single-table copies of sf0.001 files:
    * the at-rest registries key and NAME their tables by the data dir, so
    * a unique dir per fault case keeps the spec's killed builds fully
    * isolated from the real per-sf registrations other suites share. */
  private def dataDir(tag: String, tables: String*): String = {
    val d = s"$base/data_$tag"
    new java.io.File(d).mkdirs()
    for (t <- tables)
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"/root/testdata/sf0.001/$t.parquet"),
        java.nio.file.Paths.get(s"$d/$t.parquet"))
    d
  }

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] = {
    val cols = df.columns.sorted.toIndexedSeq
    df.select(cols.map(col): _*).orderBy(cols.map(col): _*)
      .collect().map(_.toString).toSeq
  }

  /** Kill the REAL build of an at-rest index in a given inter-write
    * window (via the [[graft.queries.AtRestTables.faultPoint]] seam),
    * assert the kill propagates, then prove the recovered probe equals
    * the never-faulted probe bit-for-bit. */
  private def killAndRecover(tag: String,
      probe: () => org.apache.spark.sql.DataFrame,
      expected: Seq[String]): Unit = {
    graft.queries.AtRestTables.faultHook =
      t => if (t == tag) throw new RuntimeException(s"simulated kill at $t")
    try {
      val ex = intercept[RuntimeException] { probe().collect() }
      assert(ex.getMessage.contains(s"simulated kill at $tag"))
    } finally graft.queries.AtRestTables.faultHook = _ => ()
    assert(rows(probe()) == expected,
      s"recovered probe after a kill at $tag must equal the clean build")
  }

  test("the REAL q127 IVF-PQ build killed in each inter-write window publishes nothing; q128 recovers") {
    // clean truth: the q128 probe over a never-faulted build of a
    // spec-owned embeddings copy (unique dir → unique table names)
    val expected = rows(graft.queries.VectorQueries
      .defs("q128_ivf_index_probe")(spark, dataDir("ivf_clean", "embeddings")))
    assert(expected.nonEmpty)
    // window 1: centroids landed, codebook + codes did not
    val d1 = dataDir("ivf_k1", "embeddings")
    def probe1() = graft.queries.VectorQueries.defs("q128_ivf_index_probe")(spark, d1)
    killAndRecover("ivfidx:cents", () => probe1(), expected)
    // window 2: centroids + codebook landed, the bucketed code table did not
    val d2 = dataDir("ivf_k2", "embeddings")
    val sfx2 = d2.replaceAll("[^A-Za-z0-9]", "_")
    def probe2() = graft.queries.VectorQueries.defs("q128_ivf_index_probe")(spark, d2)
    killAndRecover("ivfidx:cb", () => probe2(), expected)
    // the crash window leaves committed leading writes (that's the
    // hazard) — but never the full set, and the registry refuses to
    // serve them, which killAndRecover just proved by rebuilding
    assert(spark.catalog.tableExists(s"graft_ivf_cents_$sfx2"))
  }

  test("the REAL q148 postings/lexicon/doclen build killed in each inter-write window publishes nothing; the search recovers") {
    val expected = rows(graft.queries.TextQueries
      .defs("q148_inverted_search")(spark, dataDir("inv_clean", "documents")))
    assert(expected.nonEmpty)
    // window 1: postings landed, lexicon + doc-length table did not
    val d1 = dataDir("inv_k1", "documents")
    def probe1() = graft.queries.TextQueries.defs("q148_inverted_search")(spark, d1)
    killAndRecover("invidx:post", () => probe1(), expected)
    // window 2: postings + lexicon landed, the doc-length table did not
    // (q302's BM25 normalization side — the window the r15 verdict named)
    val d2 = dataDir("inv_k2", "documents")
    def probe2() = graft.queries.TextQueries.defs("q148_inverted_search")(spark, d2)
    killAndRecover("invidx:lex", () => probe2(), expected)
  }

  test("the REAL q303 generation build killed between the blue and green writes publishes neither") {
    // the blue/green hazard window: blue (codes1) landed, green (codes2)
    // did not — a registry that served now would hand out a generation
    // pair whose green table does not exist
    val expected = rows(graft.queries.MultimodalQueries
      .defs("q303_mm_index_generations")(spark, dataDir("mmg_clean", "documents")))
    assert(expected.nonEmpty)
    val d1 = dataDir("mmg_k1", "documents")
    def probe1() = graft.queries.MultimodalQueries
      .defs("q303_mm_index_generations")(spark, d1)
    killAndRecover("mmgen:codes1", () => probe1(), expected)
  }

  test("the REAL q304 erasure-store build killed in each inter-write window publishes nothing; the erased serve recovers") {
    // the erasure-propagation hazard: a purge job that dies after the
    // tombstones land but before the df decrements (or the retained
    // stats) would serve a HALF-FORGOTTEN index — candidates gone but
    // ranking still computed with the pre-purge statistics. The registry
    // must refuse the partial store and the re-run must converge to the
    // clean erased serve bit-for-bit.
    val expected = rows(graft.queries.TextQueries
      .defs("q304_erasure_text_serve")(spark, dataDir("ers_clean", "documents")))
    assert(expected.nonEmpty)
    // window 1: tombstones landed, decrements + retained stats did not
    val d1 = dataDir("ers_k1", "documents")
    def probe1() = graft.queries.TextQueries.defs("q304_erasure_text_serve")(spark, d1)
    killAndRecover("erasetxt:tomb", () => probe1(), expected)
    // window 2: tombstones + decrements landed, retained stats did not
    val d2 = dataDir("ers_k2", "documents")
    def probe2() = graft.queries.TextQueries.defs("q304_erasure_text_serve")(spark, d2)
    killAndRecover("erasetxt:dfdec", () => probe2(), expected)
  }

  test("the REAL q307 retained-index build killed in each inter-write window publishes nothing") {
    val expected = rows(graft.queries.VectorQueries
      .defs("q307_erasure_forget_rebuild")(spark, dataDir("fgt_clean", "embeddings")))
    assert(expected.nonEmpty)
    val d1 = dataDir("fgt_k1", "embeddings")
    def probe1() = graft.queries.VectorQueries.defs("q307_erasure_forget_rebuild")(spark, d1)
    killAndRecover("eraseann2:cents", () => probe1(), expected)
    val d2 = dataDir("fgt_k2", "embeddings")
    def probe2() = graft.queries.VectorQueries.defs("q307_erasure_forget_rebuild")(spark, d2)
    killAndRecover("eraseann2:cb", () => probe2(), expected)
  }

  test("the REAL q308 compaction killed in each inter-write window publishes nothing; the swap never half-lands") {
    // the compaction hazard is worse than a build's: a half-landed
    // rewrite that served would mix compacted postings with
    // pre-compaction statistics — the same half-forgotten state the q304
    // window guards against, now on the CoW path
    val expected = rows(graft.queries.TextQueries
      .defs("q308_erasure_compaction")(spark, dataDir("cmp_clean", "documents")))
    assert(expected.nonEmpty)
    for ((tag, i) <- Seq("erasecmp:post", "erasecmp:lex", "erasecmp:dl").zipWithIndex) {
      val d = dataDir(s"cmp_k$i", "documents")
      def probe() = graft.queries.TextQueries.defs("q308_erasure_compaction")(spark, d)
      killAndRecover(tag, () => probe(), expected)
    }
  }

  test("the REAL q314 estate remediation killed in an inter-write window publishes nothing; the audit recovers") {
    // the remediation hazard: a purge job that dies after rewriting the
    // positional index but before the exports would leave HALF the
    // estate remediated — and an audit trusting the registry would read
    // a mixed generation. The registry must refuse the partial set and
    // the re-run must converge to the clean remediation bit-for-bit.
    val expected = rows(graft.queries.TextQueries
      .defs("q314_erasure_estate_remediation")(
        spark, dataDir("rem_clean", "documents", "events")))
    assert(expected.nonEmpty)
    for ((tag, i) <- Seq("eraserem:pos", "eraserem:csv").zipWithIndex) {
      val d = dataDir(s"rem_k$i", "documents", "events")
      def probe() = graft.queries.TextQueries
        .defs("q314_erasure_estate_remediation")(spark, d)
      killAndRecover(tag, () => probe(), expected)
    }
  }

  test("a killed manifest append recovers: first-ever crash, mid-life crash, no dupes") {
    val layout = s"$base/mlayout"
    val manifest = s"$base/mmanifest"
    def wave(ids: Range): Unit =
      spark.range(ids.start, ids.end)
        .select(col("id").as("user_id"), (col("id") % 7).as("v"))
        .coalesce(1).write.mode("append").parquet(layout)

    // FIRST-EVER update killed mid-append: the manifest dir exists with
    // nothing committed — the next update must treat it as absent (this
    // threw before the r14 fix: no committed files, no schema to infer)
    wave(0 until 100); wave(100 until 250)
    plantCrashDebris(manifest)
    assert(ManifestMaintenance.update(spark, layout, manifest) == 2)
    assert(ManifestMaintenance.update(spark, layout, manifest) == 0)

    // mid-life crash: new file lands, the update toward it dies leaving
    // trash beside the committed manifest — the re-run scans exactly the
    // one unknown file and converges to the from-scratch rebuild
    wave(250 until 400)
    plantCrashDebris(manifest)
    assert(ManifestMaintenance.update(spark, layout, manifest) == 1)
    val got = spark.read.parquet(manifest)
      .orderBy("file").collect().map(_.toString).toSeq
    val want = ManifestMaintenance.rebuild(spark, layout)
      .orderBy("file").collect().map(_.toString).toSeq
    assert(got == want, s"recovered manifest diverges from rebuild:\n$got\n$want")
    assert(got.size == 3, s"expected 3 manifest rows (no duplicates), got ${got.size}")
  }
}
