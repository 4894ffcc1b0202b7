package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared helpers for query definitions + their DuckDB oracles. */
object QueryBase {

  type QFn = (SparkSession, String) => DataFrame

  /** Portable round-half-up — the SAME IEEE ops the oracle SQL uses
    * (floor(x*10^d + 0.5)/10^d), so rounded doubles hash-match. Engine
    * round() differs between Spark/DuckDB on ties, this does not. */
  def pround(c: Column, digits: Int): Column = {
    val p = math.pow(10, digits)
    floor(c * lit(p) + lit(0.5)) / lit(p)
  }

  /** isfinite(value) mirroring the reference's moment filter
    * (src/symtseries.c:267): not NaN and not ±Inf. */
  def isFiniteCol(c: Column): Column =
    !isnan(c) && c =!= lit(Double.PositiveInfinity) && c =!= lit(Double.NegativeInfinity)

  /** Order-independent, engine-portable sum of doubles: quantize each value
    * to `digits` decimals as an integer-valued double (floor(x*10^d+0.5) —
    * identical IEEE ops in Spark and DuckDB), sum exactly (integer sums
    * commute; keep Σ|x|·10^d below 2^53), then scale back. Plain double
    * sums are nondeterministic under parallel partial aggregation, and
    * double->DECIMAL casts round differently between engines (Spark via
    * shortest-string repr, DuckDB via double arithmetic), so neither
    * hash-matches a single-threaded oracle; this does. */
  def xsum(c: Column, digits: Int): Column = {
    val p = math.pow(10, digits)
    sum(floor(c * lit(p) + lit(0.5))) / lit(p)
  }

  /** Repartition a small single-file table before UDF-heavy work: the
    * testdata tables are one parquet file each, so Spark plans ONE input
    * split and the whole pipeline above the first shuffle runs on a single
    * core. One cheap round-robin shuffle buys full parallelism. (At real
    * scale inputs arrive in many files and this is a no-op decision.) */
  def spread(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)
}
