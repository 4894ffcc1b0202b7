package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The q273/q275 tie-correction term Σ n_v·(n_v−1)·(n_v+1) is CUBIC in
  * per-value tie counts, so its BIGINT headroom deserves a pinned
  * contract beside the 100 TB claim: the term is exact while no single
  * quantized value carries more than 2²¹ (= 2,097,152) rows — the
  * largest n with (n·(n−1))·(n+1) = n³−n < 2⁶³ under the production
  * left-associated evaluation order — and PAST the bound the engine
  * RAISES rather than wrapping, because the production session runs
  * ANSI mode (Spark 4.x default, asserted here against
  * `SparkUtil.configure`) just as DuckDB always checks BIGINT
  * arithmetic. A pathological value distribution is therefore a loud,
  * cross-engine-identical error — never a silent Spark-wraps /
  * DuckDB-raises divergence.
  */
class TieOverflowSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = graft.SparkUtil.configure(
      SparkSession.builder().master("local[2]"), "2").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** The exact production column shape from q273's `ties` aggregate and
    * q275's `mannWhitneyOf`. */
  private def tieTerm = col("n_v") * (col("n_v") - 1) * (col("n_v") + 1)

  test("the production session config runs ANSI mode (overflow raises)") {
    assert(spark.conf.get("spark.sql.ansi.enabled") == "true")
  }

  test("tie term is BIGINT-exact at the 2^21 per-value bound") {
    val ss = spark; import ss.implicits._
    val n = 1L << 21
    val got = Seq(n).toDF("n_v")
      .agg(sum(tieTerm).as("tie_sum")).collect()(0).getLong(0)
    assert(BigInt(got) == BigInt(n).pow(3) - n)
  }

  test("one row past the bound raises (matching DuckDB), never wraps") {
    val ss = spark; import ss.implicits._
    val n = (1L << 21) + 1
    val e = intercept[Exception] {
      Seq(n).toDF("n_v").agg(sum(tieTerm).as("tie_sum")).collect()
    }
    val chain = Iterator.iterate[Throwable](e)(_.getCause)
      .takeWhile(_ != null).take(10).toSeq
    assert(chain.exists(_.isInstanceOf[ArithmeticException]),
      s"expected an ArithmeticException in the failure chain, got: $chain")
  }
}
