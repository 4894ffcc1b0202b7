package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The q289–q293 survival/quality-statistics family on PLANTED inputs
  * with hand-computed answers: the ACF correlogram, the Kaplan–Meier
  * product-limit curve, per-type Gini concentration, the Benford
  * first-digit χ² screen, and the Markov stationary distribution. The
  * end-to-end half writes a real parquet events table (timestamp[us] ts
  * like the driver's testdata) and runs the PRODUCTION queries over it —
  * schema dispatch, quantization and all; the helper half drives the
  * factored tails with planted frames whose closed forms are computable
  * by hand.
  *
  * Fixture timeline (seconds):
  *   user 1: a@0 (1.00), a@10 (1.00), b@30 (9.99)
  *   user 2: b@0 (0.00), a@20 (2.00)
  * → transitions a→a, a→b (user 1), b→a (user 2); gaps 10, 20 | 20;
  *   censored tails 0 (user 1) and 10 (user 2); per-type user counts
  *   a: {u1: 2, u2: 1}, b: {u1: 1, u2: 1}.
  */
class SurvivalStatsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var dir: String = _

  override def beforeAll(): Unit = {
    spark = graft.SparkUtil.configure(
      SparkSession.builder().master("local[4]"), "4").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    dir = java.nio.file.Files.createTempDirectory("graft-survstats-").toString
    val ss = spark; import ss.implicits._
    val rows = Seq(
      (1L, 0L, 1L, "a", 1.00),
      (2L, 10L, 1L, "a", 1.00),
      (3L, 30L, 1L, "b", 9.99),
      (4L, 0L, 2L, "b", 0.00),
      (5L, 20L, 2L, "a", 2.00))
    rows.toDF("event_id", "sec", "user_id", "event_type", "value")
      .select(col("event_id"),
        expr("cast(timestamp_micros(sec * 1000000) as timestamp_ntz)").as("ts"),
        col("user_id"), col("event_type"), col("value"), lit("").as("props"))
      .write.parquet(s"$dir/events.parquet")
  }

  override def afterAll(): Unit = {
    if (spark != null) spark.stop()
    if (dir != null) graft.queries.AtRestTables.deleteRecursively(dir)
  }

  private def run(q: String) = SparkEntry.queries(q)(spark, dir)

  private def rnd6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6

  test("q290 Kaplan–Meier: at-risk ladder, censor-flat level, absorbing zero") {
    val r = run("q290_kaplan_meier").collect()
      .map(x => x.getLong(0) ->
        ((x.getLong(1), x.getLong(2), x.getLong(3), x.getDouble(4)))).toMap
    // levels: v=0 censored-only (u1's zero tail), v=10 one event + u2's
    // censored tail, v=20 two events absorbing everyone left
    assert(r.keySet == Set(0L, 10L, 20L))
    assert(r(0L) == ((0L, 1L, 5L, 1.0)))        // d=0 level leaves S at 1
    val lq10 = math.floor(math.log(3.0 / 4.0) * 1e6 + 0.5)
    assert(r(10L) == ((1L, 1L, 4L, rnd6(math.exp(lq10 / 1e6)))))
    assert(r(10L)._4 == 0.75)                   // micro-quantized ln round-trips
    assert(r(20L) == ((2L, 0L, 2L, 0.0)))       // d = n absorbs: curve zeroed
  }

  test("q291 Gini: planted counts give 1/6 and the equal split gives 0") {
    val r = run("q291_gini").collect()
      .map(x => x.getString(0) -> ((x.getLong(1), x.getDouble(2)))).toMap
    // a: x sorted (1,u2),(2,u1) → G = (2·5 − 3·3)/(2·3) = 1/6
    assert(r("a") == ((2L, 0.166667)))
    // b: both users have 1 event → perfectly equal → 0
    assert(r("b") == ((2L, 0.0)))
  }

  test("q292 Benford: zero-value row excluded, all nine digits recounted") {
    val r = run("q292_benford").collect()
      .map(x => x.getString(0) -> ((x.getLong(1), x.getDouble(2)))).toMap
    // independent recount with the same quantized-law constants
    val bp = (1 to 9).map(d =>
      math.floor(math.log10(1.0 + 1.0 / d) * 1e9 + 0.5) / 1e9)
    def chi2(n: Long, obs: Map[Int, Long]): Double = {
      val q = (1 to 9).map { d =>
        val e = n.toDouble * bp(d - 1)
        val a = obs.getOrElse(d, 0L).toDouble - e
        math.floor(a * a / e * 1e6 + 0.5).toLong
      }.sum
      rnd6(q.toDouble / 1e6)
    }
    // a: cents 100, 100, 200 → digits {1: 2, 2: 1}, n = 3
    assert(r("a") == ((3L, chi2(3L, Map(1 -> 2L, 2 -> 1L)))))
    // b: 9.99 → digit 9; 0.00 → avq 0 is EXCLUDED, so n = 1
    assert(r("b") == ((1L, chi2(1L, Map(9 -> 1L)))))
  }

  test("q293 Markov stationary: three integer contractions by hand") {
    val r = run("q293_markov_stationary").collect()
      .map(x => x.getString(0) -> ((x.getLong(1), x.getDouble(2)))).toMap
    // P_q: a→a 500000, a→b 500000, b→a 1000000; π₀ = (500000, 500000)
    // π₁ = (750000, 250000), π₂ = (625000, 375000), π₃ = (687500, 312500)
    assert(r("a") == ((687500L, 0.6875)))
    assert(r("b") == ((312500L, 0.3125)))
  }

  test("acfOf: perfect line r=1, alternator flips sign by lag parity") {
    val ss = spark; import ss.implicits._
    val d = (Seq(1L, 2L, 3L, 4L, 5L).zipWithIndex.map {
      case (m, i) => ("lin", i.toLong, m)
    } ++ Seq(1L, 2L, 1L, 2L, 1L).zipWithIndex.map {
      case (m, i) => ("alt", i.toLong, m)
    }).toDF("event_type", "day", "mq")
    val r = graft.queries.RelQueries.acfOf(d).collect()
      .map(x => (x.getString(0), x.getLong(1)) ->
        ((x.getLong(2), x.getDouble(3)))).toMap
    assert(r(("lin", 1L)) == ((4L, 1.0)))
    assert(r(("lin", 2L)) == ((3L, 1.0)))
    assert(r(("lin", 4L)) == ((1L, 0.0)))   // single pair: zero variance guard
    assert(!r.contains(("lin", 5L)))        // no overlap → no row
    assert(r(("alt", 1L)) == ((4L, -1.0)))  // odd lag anti-correlates
    assert(r(("alt", 2L)) == ((3L, 1.0)))   // even lag re-aligns
    assert(r(("alt", 3L)) == ((2L, -1.0)))
  }

  test("kaplanMeierOf: censored-only level keeps S flat") {
    val ss = spark; import ss.implicits._
    val lv = Seq((1L, 1L, 0L), (2L, 1L, 1L), (3L, 0L, 1L), (4L, 1L, 0L))
      .toDF("v", "d", "c")
    val r = graft.queries.RelQueries.kaplanMeierOf(lv).collect()
      .map(x => x.getLong(0) -> ((x.getLong(3), x.getDouble(4)))).toMap
    assert(r.map { case (v, (n, _)) => v -> n } ==
      Map(1L -> 5L, 2L -> 4L, 3L -> 2L, 4L -> 1L))
    assert(r(3L)._2 == r(2L)._2)            // censoring alone never drops S
    assert(r(4L)._2 == 0.0)                 // final level absorbs its last one
    val exp1 = rnd6(math.exp(math.floor(math.log(4.0 / 5.0) * 1e6 + 0.5) / 1e6))
    assert(r(1L)._2 == exp1)
  }

  test("markovStationaryOf: no-outgoing state gets the absorbing self-loop") {
    val ss = spark; import ss.implicits._
    val counts = Seq(("a", "b", 1L)).toDF("pt", "nt", "n")
    val r = graft.queries.RelQueries.markovStationaryOf(counts).collect()
      .map(x => x.getString(0) -> ((x.getLong(1), x.getDouble(2)))).toMap
    // b has no outgoing row → synthetic b→b self-loop; all mass drains
    // into b and stays; a keeps nothing (coalesced 0, not a dropped row)
    assert(r("a") == ((0L, 0.0)))
    assert(r("b") == ((1000000L, 1.0)))
  }
}
