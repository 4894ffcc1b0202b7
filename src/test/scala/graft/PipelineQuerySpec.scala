package graft

import graft.queries.{DedupQueries, RelQueries, TextQueries, VectorQueries}
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Invariants of the round-2 pipeline queries that the DuckDB oracle can't
  * express directly: multi-probe candidate containment, rollup level
  * accounting, exact-median positioning, survivor-pointer consistency. */
class PipelineQuerySpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val dir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = graft.SparkUtil.configure(
      SparkSession.builder().master("local[4]"), "4").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("q53 multi-probe candidates strictly contain the q42 exact-bucket candidates") {
    val plain = VectorQueries.defs("q42_ann_lsh_probe")(spark, dir)
      .select("query_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val multi = VectorQueries.defs("q53_ann_multiprobe")(spark, dir)
      .select("query_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(plain.subsetOf(multi), "probing MORE buckets can only add candidates")
    assert(multi.size > plain.size, "1-bit-flip probes must widen the candidate set")
  }

  test("q54 rollup emits all three grouping levels with consistent totals") {
    val rows = RelQueries.defs("q54_rollup_pricing")(spark, dir).collect()
    val byGid = rows.groupBy(_.getAs[Long]("gid"))
    assert(byGid.keySet == Set(0L, 1L, 3L)) // leaf, per-flag subtotal, grand total
    assert(byGid(3L).length == 1)
    val grand = byGid(3L).head.getAs[Long]("n")
    assert(byGid(0L).map(_.getAs[Long]("n")).sum == grand)
    assert(byGid(1L).map(_.getAs[Long]("n")).sum == grand)
    // subtotal rows aggregate away linestatus only
    assert(byGid(1L).forall(r => r.isNullAt(r.fieldIndex("l_linestatus")) &&
      !r.isNullAt(r.fieldIndex("l_returnflag"))))
  }

  test("q55 median matches a driver-side exact median") {
    val events = spark.read.parquet(s"$dir/events.parquet")
      .select("event_type", "value", "event_id").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    val expected = events.groupBy(_._1).map { case (t, vs) =>
      val sorted = vs.sortBy(v => (v._2, v._3)).map(_._2)
      val n = sorted.length
      val lo = sorted((n + 1) / 2 - 1); val hi = sorted(n / 2)
      t -> math.floor((lo + hi) / 2 * 1e6 + 0.5) / 1e6
    }
    val got = RelQueries.defs("q55_median_value")(spark, dir).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(got == expected)
  }

  test("q56 survivor pointers are consistent with the q30 dup count") {
    val rows = DedupQueries.defs("q56_dedup_survivors")(spark, dir).collect()
    val docCount = spark.read.parquet(s"$dir/documents.parquet").count()
    assert(rows.length == docCount, "one annotated row per document")
    assert(rows.forall(r => r.getLong(1) <= r.getLong(0)), "canonical is the min id")
    assert(rows.forall(r => r.getAs[Boolean]("is_dup") == (r.getLong(0) != r.getLong(1))))
    val dupCount = DedupQueries.defs("q30_dedup_exact")(spark, dir)
      .collect().head.getAs[Long]("n_dup_docs")
    assert(rows.count(_.getAs[Boolean]("is_dup")) == dupCount,
      "one dup flag per non-surviving duplicate")
  }

  test("q60 pipeline stats respect the stage filters") {
    val perLang = spark.read.parquet(s"$dir/documents.parquet")
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val rows = TextQueries.defs("q60_pipeline_e2e")(spark, dir).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val lang = r.getString(0)
      assert(r.getLong(1) <= perLang(lang), "kept docs never exceed the stratum")
      // every kept doc clears the 0.7 quality floor, so the average must too
      assert(r.getDouble(3) >= 0.7)
    }
    // the dominant stratum is actually downsampled: strictly fewer 'en'
    // docs than the quality floor alone would keep
    val enKept = rows.find(_.getString(0) == "en").map(_.getLong(1)).getOrElse(0L)
    assert(enKept < perLang("en"))
  }
}
