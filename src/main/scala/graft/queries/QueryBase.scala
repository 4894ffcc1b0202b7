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

  /** Exact-decimal cast used for order-independent sums: double sums are
    * nondeterministic under Spark's parallel partial aggregation, decimal
    * sums are exact, so `cast(sum(decimal) as double)` is reproducible and
    * matches the oracle's identical formulation bit-for-bit. */
  def dec6(c: Column): Column = c.cast("decimal(18,6)")
}
