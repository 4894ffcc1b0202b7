package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The q271–q274 nonparametric-statistics family on a PLANTED events
  * table with hand-computed answers: Theil–Sen median slope, the
  * Wald–Wolfowitz runs test, Kruskal–Wallis H (with tie correction), and
  * Spearman ρ. The fixture is written as a real parquet events table
  * (timestamp[us] ts like the driver's testdata) and the PRODUCTION
  * queries run over it end-to-end — schema dispatch, quantization, rank
  * arithmetic and all.
  *
  * Fixture: one event per (type, day), so the daily mean mq is exactly
  * value·10⁶.
  *   "up":     days 0–4, values 1,2,3,4,5  (a perfect line)
  *   "vshape": days 0–4, values 3,1,2,1,5  (ties + reversals)
  */
class TrendStatsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var dir: String = _

  override def beforeAll(): Unit = {
    spark = graft.SparkUtil.configure(
      SparkSession.builder().master("local[4]"), "4").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    dir = java.nio.file.Files.createTempDirectory("graft-trendstats-").toString
    val ss = spark; import ss.implicits._
    val rows = (Seq(1.0, 2.0, 3.0, 4.0, 5.0).zipWithIndex.map {
      case (v, d) => ("up", d, v)
    } ++ Seq(3.0, 1.0, 2.0, 1.0, 5.0).zipWithIndex.map {
      case (v, d) => ("vshape", d, v)
    }).zipWithIndex.map { case ((t, d, v), i) =>
      (i.toLong, d.toLong * 86400000000L + 3600000000L, i.toLong, t, v, "")
    }
    rows.toDF("event_id", "us", "user_id", "event_type", "value", "props")
      .select(col("event_id"),
        expr("cast(timestamp_micros(us) as timestamp_ntz)").as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
      .write.parquet(s"$dir/events.parquet")
  }

  override def afterAll(): Unit = {
    if (spark != null) spark.stop()
    if (dir != null) graft.queries.AtRestTables.deleteRecursively(dir)
  }

  private def run(q: String) = SparkEntry.queries(q)(spark, dir)

  test("q271 Theil–Sen: perfect line gives slope 1, the V gives median 0") {
    val r = run("q271_theil_sen").collect()
      .map(x => x.getString(0) -> ((x.getLong(1), x.getDouble(2)))).toMap
    assert(r("up") == ((10L, 1.0)))       // all 10 pairwise slopes are 1
    // vshape slopes sorted: -2, -1, -2/3, -1/2, 0, 1/2, 1, 4/3, 3/2, 4
    // → lower median (rank 5 of 10) = 0
    assert(r("vshape") == ((10L, 0.0)))
  }

  test("q272 runs test: hand-computed R, n1, n2, z") {
    val r = run("q272_runs_test").collect()
      .map(x => x.getString(0) ->
        ((x.getLong(1), x.getLong(2), x.getLong(3), x.getDouble(4)))).toMap
    // up: median mq = 3e6 (day 2 dropped), signs by day: -,-,+,+ → R=2
    // E = 1 + 2·2·2/4 = 3, V = 8·4/(16·3) = 2/3, z = -1/√(2/3) = -1.224745
    assert(r("up") == ((2L, 2L, 2L, -1.224745)))
    // vshape: median mq = 2e6 (day 2 dropped), signs: +,-,-,+ → R=3, z=0
    assert(r("vshape") == ((2L, 2L, 3L, 0.0)))
  }

  test("q273 Kruskal–Wallis: hand-computed H and tie correction") {
    val r = run("q273_kruskal_wallis").collect().head
    // N=10, k=2; doubled midranks per value: 100→4, 200→9, 300→13,
    // 400→16, 500→19; R2 sums: up=61, vshape=49 (Σ = N(N+1) ✓)
    // H = 12/110 · (61²/20 + 49²/20) − 33 = 43.2/110 = 0.392727
    // ΣT = 24+18 = 42, C = 948/990, H/C = 0.410127
    assert(r.getLong(0) == 10L && r.getLong(1) == 2L)
    assert(r.getDouble(2) == 0.392727)
    assert(r.getDouble(3) == 0.410127)
  }

  test("q274 Spearman: monotone series gives exactly 1, vshape hand value") {
    val r = run("q274_spearman_trend").collect()
      .map(x => x.getString(0) -> ((x.getLong(1), x.getDouble(2)))).toMap
    assert(r("up") == ((5L, 1.0)))
    // vshape: rx=1..5, ry2=(8,3,6,3,10) → num=20, d1=50, d2=190,
    // ρ = 20/√9500 = 0.205196
    assert(r("vshape") == ((5L, 0.205196)))
  }
}
