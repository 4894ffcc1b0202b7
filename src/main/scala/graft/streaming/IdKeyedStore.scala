package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType

/** The read side of the id-keyed append protocol every streaming
  * maintenance store here uses (`batch=<id>/` directories, one per
  * micro-batch, overwrite-on-replay): ONE committed-batch discipline for
  * all of them. A batch directory is SERVED only when its write
  * committed — the `_SUCCESS` marker — because a write killed mid-flight
  * leaves the directory with task trash and possibly a partial subset of
  * its part files: reading those would serve a store state that never
  * existed (neither pre- nor post-batch), and a torn FIRST batch (zero
  * committed files anywhere) would make an unguarded root read throw
  * schema-inference errors on every access. The replay that follows the
  * crash overwrites the torn directory and the batch becomes visible
  * atomically with its marker.
  *
  * All path inspection resolves through the session's Hadoop
  * `FileSystem` (the same resolver Spark's own writers use), never
  * `java.io.File` — a java.io listing silently returns empty on
  * HDFS/S3, which would un-publish every landed batch even though the
  * stores themselves were written fine. */
private[streaming] object IdKeyedStore {

  private def fsOf(spark: SparkSession, dir: String) = {
    val p = new Path(dir)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  /** Batch ids whose directory committed (`_SUCCESS` present) under
    * `dir`. */
  def committedIds(spark: SparkSession, dir: String): Set[Long] = {
    val (fs, p) = fsOf(spark, dir)
    if (!fs.exists(p) || !fs.getFileStatus(p).isDirectory) Set.empty
    else fs.listStatus(p).toIndexedSeq
      .filter(st => st.isDirectory &&
        fs.exists(new Path(st.getPath, "_SUCCESS")))
      .flatMap(st => "batch=(\\d+)".r.findFirstMatchIn(st.getPath.getName)
        .map(_.group(1).toLong))
      .toSet
  }

  /** Whether ONE specific batch directory committed under `dir` — the
    * write-side replay skip-check (cheaper than listing every sibling
    * when only one id is in question). */
  def batchCommitted(spark: SparkSession, dir: String, batchId: Long): Boolean = {
    val (fs, p) = fsOf(spark, dir)
    fs.exists(new Path(p, s"batch=$batchId/_SUCCESS"))
  }

  /** The accumulated store restricted to committed batches, lineage
    * column dropped. When nothing has committed yet: with `emptySchema`
    * supplied, returns an EMPTY frame of that schema (a serve/monitor
    * probe racing the first micro-batch sees an empty store, not a
    * crash); without one, fails LOUDLY naming the contract — the
    * alternative is an opaque parquet schema-inference error from a root
    * holding only crash debris. */
  def readCommitted(spark: SparkSession, dir: String,
                    emptySchema: Option[StructType] = None): DataFrame = {
    val ok = committedIds(spark, dir)
    if (ok.isEmpty) emptySchema match {
      case Some(s) =>
        spark.createDataFrame(spark.sparkContext.emptyRDD[Row], s)
      case None => throw new IllegalArgumentException(
        s"graft: no committed batch under $dir — nothing has landed, or " +
          "every landed batch is crash debris awaiting its replay")
    }
    else spark.read.parquet(dir)
      .where(col("batch").isin(ok.toSeq: _*)).drop("batch")
  }
}
