package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

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
  * atomically with its marker. */
private[streaming] object IdKeyedStore {

  /** Batch ids whose directory committed (`_SUCCESS` present) under
    * `dir`. */
  def committedIds(dir: String): Set[Long] = {
    val d = new java.io.File(dir)
    if (!d.isDirectory) Set.empty
    else d.listFiles().toIndexedSeq
      .filter(f => new java.io.File(f, "_SUCCESS").isFile)
      .flatMap(f => "batch=(\\d+)".r.findFirstMatchIn(f.getName).map(_.group(1).toLong))
      .toSet
  }

  /** The accumulated store restricted to committed batches, lineage
    * column dropped. Fails LOUDLY (naming the contract) when nothing has
    * committed — the alternative is an opaque parquet schema-inference
    * error from a root holding only crash debris. */
  def readCommitted(spark: SparkSession, dir: String): DataFrame = {
    val ok = committedIds(dir)
    require(ok.nonEmpty,
      s"graft: no committed batch under $dir — nothing has landed, or " +
        "every landed batch is crash debris awaiting its replay")
    spark.read.parquet(dir)
      .where(col("batch").isin(ok.toSeq: _*)).drop("batch")
  }
}
