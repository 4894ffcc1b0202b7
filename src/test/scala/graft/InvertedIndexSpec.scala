package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** q148's scale contract: the at-rest inverted index must serve a
  * conjunctive term query by reading ONLY the posting buckets the query
  * terms hash to (bucket pruning — the q78/q128 mechanism applied to
  * text search), and the index path must return exactly what a direct
  * tokenize-and-scan of the corpus returns. Value-level equality against
  * DuckDB is the oracle gate's job (q148 row); this pins the plan shape
  * and the index-vs-direct agreement inside one engine. */
class InvertedIndexSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val dir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = graft.SparkUtil.configure(
      SparkSession.builder().master("local[4]"), "4").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("q148 probe scans a pruned subset of the posting buckets") {
    val df = SparkEntry.queries("q148_inverted_search")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    // the postings FileScan must carry bucket selection: 3 query terms
    // hash to at most 3 of the 8 buckets
    val scanLine = plan.linesIterator
      .find(l => l.contains("SelectedBucketsCount"))
      .getOrElse(fail(s"no bucket-pruned scan in:\n$plan"))
    val sel = "SelectedBucketsCount: (\\d+) out of (\\d+)".r
      .findFirstMatchIn(scanLine)
      .getOrElse(fail(s"unparsable bucket count: $scanLine"))
    assert(sel.group(2).toInt > 1, s"layout not bucketed: $scanLine")
    assert(sel.group(1).toInt < sel.group(2).toInt,
      s"no bucket pruning: $scanLine")
    assert(sel.group(1).toInt <= 3, s"more buckets than terms: $scanLine")
  }

  test("q148 index path equals the direct corpus scan") {
    val viaIndex = SparkEntry.queries("q148_inverted_search")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet

    // the same query computed with no index at all: tokenize the corpus,
    // rank terms by df, take the rarest 3, conjunctive-match
    val toks = filter(split(lower(col("text")), "\\s+"), t => t =!= "")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val tf = docs.select(col("doc_id"), explode(toks).as("term"))
      .groupBy("term", "doc_id").agg(count(lit(1)).as("tf"))
    val qterms = tf.groupBy("term").agg(count(lit(1)).as("df"))
      .orderBy(col("df").asc, col("term").asc).limit(3)
      .select("term").collect().map(_.getString(0))
    assert(qterms.length == 3)
    val hits = tf.where(col("term").isin(qterms.toIndexedSeq: _*))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_terms"), sum("tf").as("sum_tf"))
      .where(col("n_terms") === 3)
    val direct = docs.join(hits, "doc_id")
      .select(col("doc_id"), col("lang"), col("n_chars"), col("sum_tf"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet

    assert(viaIndex == direct,
      s"index vs direct diverge: ${viaIndex.size} vs ${direct.size} rows")
    assert(viaIndex.nonEmpty, "degenerate test: conjunction matched nothing")
  }

  test("q261 phrase probe scans a pruned subset of the positional buckets") {
    val df = SparkEntry.queries("q261_phrase_search")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    // both positional scans (w1 side, w2 side) must carry bucket
    // selection: one term hashes to exactly one of the buckets
    val scans = plan.linesIterator.filter(_.contains("SelectedBucketsCount")).toSeq
    assert(scans.nonEmpty, s"no bucket-pruned positional scan in:\n$plan")
    scans.foreach { line =>
      val sel = "SelectedBucketsCount: (\\d+) out of (\\d+)".r
        .findFirstMatchIn(line)
        .getOrElse(fail(s"unparsable bucket count: $line"))
      assert(sel.group(1).toInt == 1 && sel.group(2).toInt > 1,
        s"one-term scan must touch exactly one bucket: $line")
    }
  }

  test("q261 phrase hits equal a direct positional corpus scan") {
    val viaIndex = SparkEntry.queries("q261_phrase_search")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet

    val toks = filter(split(lower(col("text")), "\\s+"), t => t =!= "")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val tok = docs.select(col("doc_id"), posexplode(toks).as(Seq("p0", "term")))
      .select(col("doc_id"), col("term"), (col("p0") + lit(1L)).as("pos"))
    val ph = tok.groupBy("term").agg(countDistinct("doc_id").as("df"))
      .orderBy(col("df").desc, col("term").asc).limit(2)
      .select("term").collect().map(_.getString(0))
    val a = tok.where(col("term") === ph(0)).select(col("doc_id"), col("pos"))
    val b = tok.where(col("term") === ph(1))
      .select(col("doc_id").as("db"), (col("pos") - lit(1L)).as("pa"))
    val hits = a.join(b, col("doc_id") === col("db") && col("pos") === col("pa"))
      .groupBy("doc_id").agg(count(lit(1)).as("n_occ"))
    val direct = docs.join(hits, "doc_id")
      .select(col("doc_id"), col("lang"), col("n_occ"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet

    assert(viaIndex == direct,
      s"phrase index vs direct diverge: ${viaIndex.size} vs ${direct.size} rows")
    assert(viaIndex.nonEmpty, "degenerate test: phrase matched nothing")
  }
}
