package graft

import graft.queries.QueryBase
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** `QueryBase.pround` must be the oracle's IEEE double arithmetic
  * (floor(x·10^d + 0.5)/10^d with a DOUBLE floor) at EVERY magnitude.
  * Spark's floor() returns LONG and saturates at ±2^63 — q221's µs means
  * at sf0.001 crossed that and hash-mismatched as Long.MaxValue/1e6
  * until the r15 branch kept the computation in doubles (below 2^52 the
  * long floor is exact; at/above, doubles are already integral). */
class ProundSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = graft.SparkUtil.configure(
      SparkSession.builder().master("local[2]"), "2").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def pr(v: Double, d: Int): Double = {
    val ss = spark; import ss.implicits._
    Seq(v).toDF("x").select(QueryBase.pround(col("x"), d)).first().getDouble(0)
  }

  /** The oracle's arithmetic, verbatim (Scala math.floor IS the IEEE
    * double floor DuckDB uses). */
  private def oracle(v: Double, d: Int): Double = {
    val p = math.pow(10, d)
    math.floor(v * p + 0.5) / p
  }

  test("ordinary magnitudes: half-up ties, negatives, exact equality") {
    for (v <- Seq(2.5, -2.5, 0.1234565, -0.1234565, 123.456789, 1e-7, 0.0);
         d <- Seq(0, 2, 6)) {
      assert(pr(v, d) == oracle(v, d), s"pround($v, $d)")
    }
    assert(pr(2.5, 0) == 3.0)   // floor(x+0.5), not banker's rounding
    assert(pr(-2.5, 0) == -2.0)
  }

  test("magnitudes past 2^63/10^d no longer saturate (the q221 sf0.001 bug)") {
    val big = 1.2313666881028941e13 // x*1e6 ≈ 1.23e19 > Long.MaxValue
    assert(pr(big, 6) == oracle(big, 6),
      "pround must stay in doubles where Spark's long floor saturates")
    assert(pr(big, 6) != Long.MaxValue.toDouble / 1e6)
    assert(pr(-big, 6) == oracle(-big, 6))
    // the 2^52 branch boundary itself: integral doubles pass through
    val edge = 4503599627370496.0
    assert(pr(edge, 0) == oracle(edge, 0))
    assert(pr(edge - 0.5, 0) == oracle(edge - 0.5, 0))
  }

  test("non-finite inputs propagate like the oracle's double floor") {
    // DuckDB: floor(NaN) = NaN, floor(±Inf) = ±Inf — pround must agree
    // (no oracle-facing path feeds these today; this is the robustness
    // contract so a future one can't silently diverge)
    assert(pr(Double.NaN, 6).isNaN, "pround(NaN) must stay NaN")
    assert(pr(Double.PositiveInfinity, 6).isPosInfinity)
    assert(pr(Double.NegativeInfinity, 6).isNegInfinity)
  }
}
