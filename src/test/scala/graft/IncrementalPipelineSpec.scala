package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** q295 (the incremental pipeline delta) must equal the full q294 rerun
  * row-for-row: base ids precede delta ids, so every combined min-per-key
  * resolves to the incremental winner — the spec checks the theorem on
  * the real table AND on a planted fixture that forces each anti-join
  * path (a delta doc exact-duplicating base, and a delta doc that is a
  * WORD-ORDER PERMUTATION of a base doc — different normalized-text md5,
  * identical order-free simhash — so only the fingerprint stage can
  * catch it). */
class IncrementalPipelineSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var fixdir: String = _

  override def beforeAll(): Unit = {
    spark = graft.SparkUtil.configure(
      SparkSession.builder().master("local[4]"), "4").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    fixdir = java.nio.file.Files.createTempDirectory("graft-incr-pipe-").toString
    val ss = spark; import ss.implicits._
    // max id 10 → T = 8: base ids 1..7, delta ids 8..10
    Seq(
      (1L, "en", "the quick brown fox and the lazy dog run the field"),
      (2L, "en", "alpha beta gamma the word order of this test"),
      (3L, "en", "a completely different base document of real value"),
      (4L, "en", "of all the base rows this one is the filler"),
      (5L, "en", "and the corpus keeps a few more of these lines"),
      (6L, "en", "the sixth base document of the planted corpus"),
      (7L, "en", "a seventh base line of text and nothing else"),
      // exact duplicate of id 1 → same md5(norm) → exact stage drops it
      (8L, "en", "the quick brown fox and the lazy dog run the field"),
      // word-order permutation of id 2 → DIFFERENT md5(norm), SAME
      // order-free simhash → only the fingerprint stage drops it
      (9L, "en", "gamma beta alpha the word order of this test"),
      // genuinely new → kept
      (10L, "en", "a fresh delta document the pipeline must keep and count"))
      .toDF("doc_id", "lang", "text")
      .write.parquet(s"$fixdir/documents.parquet")
  }

  override def afterAll(): Unit = {
    if (spark != null) spark.stop()
    if (fixdir != null) graft.queries.AtRestTables.deleteRecursively(fixdir)
  }

  private def report(q: String, dir: String): Map[String, Row] =
    SparkEntry.queries(q)(spark, dir).collect()
      .map(r => r.getString(r.fieldIndex("split")) -> r).toMap

  private def shared(r: Row): Seq[Any] =
    Seq("n_docs", "ws_tokens", "docs_in", "after_lang", "after_quality",
      "after_exact", "after_near").map(c => r.get(r.fieldIndex(c)))

  test("incremental delta equals the full rerun on the real table") {
    val full = report("q294_training_pipeline", "/root/testdata/sf0.001")
    val incr = report("q295_pipeline_delta", "/root/testdata/sf0.001")
    assert(full.keySet == incr.keySet)
    for (k <- full.keySet)
      assert(shared(full(k)) == shared(incr(k)),
        s"split $k diverged:\nfull ${full(k)}\nincr ${incr(k)}")
  }

  test("planted fixture: exact collision and fingerprint permutation both drop") {
    val incr = report("q295_pipeline_delta", fixdir)
    val any = incr.values.head
    def f(c: String): Long = any.getLong(any.fieldIndex(c))
    assert(f("t_split") == 8L)
    assert(f("docs_in") == 10L && f("after_lang") == 10L &&
      f("after_quality") == 10L)
    // id 8 dies at the exact stage (base h collision): 10 → 9
    assert(f("after_exact") == 9L, s"exact stage: $any")
    // id 9 dies at the fingerprint stage (base simhash collision): 9 → 8
    assert(f("after_near") == 8L, s"fingerprint stage: $any")
    // only id 10 survives from the delta
    assert(f("delta_kept") == 1L)
    // and the incremental report still equals the full rerun
    val full = report("q294_training_pipeline", fixdir)
    for (k <- full.keySet)
      assert(shared(full(k)) == shared(incr(k)), s"split $k diverged")
  }
}
