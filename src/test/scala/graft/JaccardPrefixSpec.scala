package graft

import graft.queries.DedupQueries
import graft.text.TextHash
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** q52's prefix-filter join claims EXACTNESS: its output must be every
  * pair with shingle-Jaccard >= t, not just the pairs some blocking
  * scheme happens to surface (that's the difference vs MinHash-LSH q32).
  * This spec brute-forces all O(n^2) pairs at sf0.001 on the driver and
  * checks set equality with the distributed prefix-filtered join. */
class JaccardPrefixSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = graft.SparkUtil.configure(
      SparkSession.builder().master("local[4]"), "4").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("prefix-filter join == brute-force all-pairs jaccard >= t") {
    val t = 0.6 // must match DedupQueries.JaccardThreshold
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> TextHash.shingles(TextHash.tokenize(r.getString(1)), 3).toSet)
      .sortBy(_._1)
    val brute = (for {
      i <- docs.indices.iterator
      j <- (i + 1) until docs.length
      (ida, sa) = docs(i); (idb, sb) = docs(j)
      jac = (sa & sb).size.toDouble / (sa | sb).size
      if jac >= t
    } yield (ida, idb)).toSet

    val got = DedupQueries.defs("q52_jaccard_prefix_join")(spark, "/root/testdata/sf0.001")
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    assert(brute.nonEmpty, "testdata should contain near-dup pairs at this threshold")
    assert(got == brute)
  }
}
