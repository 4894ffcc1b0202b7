package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Canary against silent driver-side testdata regeneration: r10's rebuild
  * changed events.ts from integer-ns to parquet `timestamp[us]` AFTER the
  * round's last commit, and every time-ordered query started throwing at
  * ANALYSIS time — invisible to any spec that doesn't open the real
  * parquet. This suite opens every table and ANALYZES (no execution —
  * sub-second) one query per family plus both streaming surfaces, so the
  * next schema drift reddens the suite at the right place instead of
  * silently shrinking the correctness artifact. */
class SchemaCanarySpec extends AnyFunSuite with BeforeAndAfterAll {

  private val dir = "/root/testdata/sf0.001"
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = graft.SparkUtil.configure(
      SparkSession.builder().master("local[4]"), "4").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("every testdata table opens and exposes a schema") {
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    tables.foreach { t =>
      val schema = SparkUtil.table(spark, dir, t).schema
      assert(schema.nonEmpty, s"$t: empty schema")
    }
  }

  test("one query per family ANALYZES against the live schema") {
    // chosen to cover every table + every time-arithmetic surface while
    // staying lazy during construction (no eager collect in the builder)
    val picks = Seq(
      "q02_sax_window_encode",   // SAX window spec over events.ts
      "q19_sax_stream_replay",   // typed replay (tsUs into encoder tuple)
      "q26_asof_join",           // two-sided µs comparison
      "q27_sessionize",          // lag/gap arithmetic on ts_us
      "q28_sax_weekly",          // integer week bucketing
      "q71_time_resample",       // hour bucketing
      "q119_range_join",         // τ-bucketed range join
      "q20_pricing_summary",     // lineitem
      "q21_revenue_by_nation",   // region/nation/customer/orders/lineitem join
      "q24_brand_agg",           // part/supplier
      "q30_dedup_exact",         // documents
      "q35_lang_id",             // text analysis
      "q40_ann_brute",           // embeddings
      "q45_multimodal_decode",   // binary payload plumbing
      "q68_json_extract")        // props JSON surface
    picks.foreach { name =>
      val analyzed = SparkEntry.queries(name)(spark, dir).queryExecution.analyzed
      assert(analyzed.resolved, s"$name: plan did not resolve")
    }
  }

  test("both streaming surfaces analyze against the live events schema") {
    import org.apache.spark.sql.functions.col
    val ev = spark.read.parquet(s"$dir/events.parquet")
    val typed = graft.streaming.SaxStreaming.seriesEvents(ev)
    assert(typed.queryExecution.analyzed.resolved)
    val rj = graft.streaming.StreamingRangeJoin.pairs(
      ev.select(col("event_id"), col("user_id"), col("ts")), "1 hour")
    assert(rj.queryExecution.analyzed.resolved)
  }
}
