package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** q318 (pipeline drop attribution) must RECONCILE with q294's funnel —
  * the two reports are projections of one stage algebra, so
  * docs_in − n(language) = after_lang, … , n(kept) = after_near, exactly
  * — and every attribution arm must be reachable: the synthetic corpus
  * never fails the quality gate, so a planted fixture drives one doc
  * through each of the five arms (und language, low-quality English,
  * exact duplicate, word-order permutation caught only by the simhash
  * stage, and a kept survivor). */
class PipelineAttributionSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var fixdir: String = _

  override def beforeAll(): Unit = {
    spark = graft.SparkUtil.configure(
      SparkSession.builder().master("local[4]"), "4").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    fixdir = java.nio.file.Files.createTempDirectory("graft-attr-pipe-").toString
    val ss = spark; import ss.implicits._
    Seq(
      // no language markers at all → pred_lang = 'und' → 1_language
      (1L, "xx", "7 8 9 44 55 66 % % % 123 456 789"),
      // English markers but degenerate: 1 type / 10 tokens (0.05), no
      // punctuation (0.30), all stopwords (0.00) → quality 0.35 < 0.5
      (2L, "en", "the the the the the the the the the the"),
      // healthy survivor → 5_kept
      (3L, "en", "the quick brown fox jumps over a lazy dog today"),
      // exact duplicate of 3 (same normalized md5) → 3_exact_dup
      (4L, "en", "The quick brown fox jumps over a lazy dog today!"),
      // word-order permutation of 3: different normalized md5, same
      // order-free simhash → only the fingerprint stage drops it
      (5L, "en", "today dog lazy a over jumps fox brown quick the"))
      .toDF("doc_id", "lang", "text")
      .write.parquet(s"$fixdir/documents.parquet")
  }

  override def afterAll(): Unit = {
    if (spark != null) spark.stop()
    if (fixdir != null) graft.queries.AtRestTables.deleteRecursively(fixdir)
  }

  private def attribution(dir: String): Map[String, (Long, Long)] =
    SparkEntry.queries("q318_pipeline_attribution")(spark, dir).collect()
      .map(r => r.getString(r.fieldIndex("stage")) ->
        ((r.getLong(r.fieldIndex("n_docs")),
          r.getLong(r.fieldIndex("ws_tokens"))))).toMap

  private def funnel(dir: String): Map[String, Long] = {
    val r = SparkEntry.queries("q294_training_pipeline")(spark, dir)
      .collect().head
    Seq("docs_in", "after_lang", "after_quality", "after_exact", "after_near")
      .map(c => c -> r.getLong(r.fieldIndex(c))).toMap
  }

  private def reconcile(dir: String): Unit = {
    val att = attribution(dir)
    val f = funnel(dir)
    def n(stage: String): Long = att.get(stage).map(_._1).getOrElse(0L)
    assert(att.values.map(_._1).sum == f("docs_in"), "Σ n_docs != docs_in")
    assert(f("docs_in") - n("1_language") == f("after_lang"))
    assert(f("after_lang") - n("2_quality") == f("after_quality"))
    assert(f("after_quality") - n("3_exact_dup") == f("after_exact"))
    assert(f("after_exact") - n("4_near_dup") == f("after_near"))
    assert(n("5_kept") == f("after_near"))
  }

  test("attribution reconciles with the q294 funnel on the real table") {
    reconcile("/root/testdata/sf0.001")
  }

  test("every attribution arm is reachable (planted five-arm fixture)") {
    val att = attribution(fixdir)
    assert(att.keySet == Set("1_language", "2_quality", "3_exact_dup",
      "4_near_dup", "5_kept"), s"arms hit: ${att.keySet}")
    assert(att.values.forall(_._1 == 1L), s"one doc per arm: $att")
    reconcile(fixdir)
  }
}
