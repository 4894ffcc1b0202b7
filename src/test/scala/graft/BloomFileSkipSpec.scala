package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** q212's content-based file skipping: the bloom manifest must actually
  * prune files for a rare needle, and the pruned scan must equal the
  * full-layout scan (blooms have no false negatives). */
class BloomFileSkipSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val dir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = graft.SparkUtil.configure(
      SparkSession.builder().master("local[4]"), "4").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def manifest = {
    // materialize the layout through the query itself, then inspect
    queries.TextQueries.defs("q212_bloom_file_skip")(spark, dir).collect()
    val sfx = dir.replaceAll("[^A-Za-z0-9]", "_")
    spark.table(s"graft_docs_bloomman_$sfx")
  }

  test("a rare needle opens a strict subset of the layout's files") {
    val man = manifest
    val allFiles = man.select("file").distinct().count()
    assert(allFiles >= 4, "layout should have several files")
    // recompute the probe's file set the way the query does
    val toks = filter(split(lower(col("text")), "\\s+"), t => t =!= "")
    val needle = spark.read.parquet(s"$dir/documents.parquet")
      .select(explode(toks).as("t"))
      .groupBy("t").agg(count(lit(1)).as("freq"))
      .orderBy(col("freq"), col("t")).limit(1)
      .collect()(0).getString(0)
    val bits = (0 until queries.TextQueries.BloomK).map(j =>
      math.floorMod(graft.text.TextHash.hash60(s"$needle:$j"),
        queries.TextQueries.BloomBits.toLong))
    val opened = man.where(col("bit").isin(bits: _*))
      .groupBy("file").agg(countDistinct(col("bit")).as("h"))
      .where(col("h") === bits.distinct.length.toLong).count()
    assert(opened >= 1, "the file holding the needle must survive")
    assert(opened < allFiles,
      s"bloom should skip at least one of $allFiles files (opened $opened)")
  }

  test("pruned probe equals the raw full scan (no false negatives)") {
    val got = queries.TextQueries.defs("q212_bloom_file_skip")(spark, dir)
      .collect().map(_.toString).sorted.toSeq
    val toks = filter(split(lower(col("text")), "\\s+"), t => t =!= "")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val needle = docs.select(explode(toks).as("t"))
      .groupBy("t").agg(count(lit(1)).as("freq"))
      .orderBy(col("freq"), col("t")).limit(1)
      .collect()(0).getString(0)
    val want = docs
      .withColumn("occ", size(filter(toks, t => t === lit(needle))).cast("long"))
      .where(col("occ") > 0)
      .agg(count(lit(1)).as("n_docs"), sum("occ").as("n_occurrences"),
        sum("n_chars").as("sum_chars"))
      .select(lit(needle).as("needle"), col("n_docs"),
        col("n_occurrences"), col("sum_chars"))
      .collect().map(_.toString).sorted.toSeq
    assert(got == want)
  }
}
