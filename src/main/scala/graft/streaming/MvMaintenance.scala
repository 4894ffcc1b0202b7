package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

/** Continuous maintenance of the q138 materialized aggregate from an
  * events stream — the third leg of the event-store lifecycle beside
  * [[PartitionedIngest]] (files in) and its compaction (files kept
  * healthy): the AGGREGATE kept current. Each micro-batch collapses to
  * the shared integer partials ([[graft.queries.RelQueries.dayTypePartials]]
  * — count + scaled-integer sum per (day, event_type), the ONE definition
  * q138's batch base/delta also use) and merges them into the persisted
  * MV by plain addition. Per-batch cost is O(delta + |MV|) where |MV| is
  * bounded by key cardinality (days × event types), never O(history) —
  * at 100 TB the raw stream is huge but the MV stays tiny, which is the
  * entire point of maintaining it incrementally.
  *
  * Write protocol: each merge writes a NEW versioned directory and then
  * flips a one-line `_current` pointer file (write-temp + atomic move) —
  * readers resolve the pointer and never observe a half-written table,
  * the same never-in-place discipline as
  * [[PartitionedIngest.compactDaily]]. (A production deployment would get
  * this commit atomicity from a table format; the pointer file is the
  * dependency-free equivalent.) Exactly-once across restarts: foreachBatch
  * is at-least-once, so a batch may REPLAY after its merge already
  * flipped the pointer — the pointer therefore records the batch id, and
  * a merge whose id is ≤ the pointer's is a no-op. Batch ids are
  * monotone and a replayed id carries identical rows (checkpoint replay),
  * so skip-if-applied makes the merge exactly-once.
  *
  * MvMaintenanceSpec replays sf0.001 in micro-batches and proves the
  * final MV row-identical to the direct batch aggregate — the integer
  * partials make the equality exact, not approximate. */
object MvMaintenance {

  private def pointerPath(mvDir: String) =
    java.nio.file.Paths.get(mvDir, "_current")

  /** (applied batch id, version path) from the pointer, if any. */
  private def currentVersion(mvDir: String): Option[(Long, String)] = {
    val p = pointerPath(mvDir)
    if (!java.nio.file.Files.exists(p)) None
    else java.nio.file.Files.readString(p).trim.split("\t") match {
      case Array(id, path) => Some((id.toLong, path))
      case _ => None
    }
  }

  /** The current MV contents (integer partials), or None before the
    * first merge. */
  def readMv(spark: SparkSession, mvDir: String): Option[DataFrame] =
    currentVersion(mvDir).map { case (_, path) => spark.read.parquet(path) }

  /** Merge one batch of raw events into the MV at `mvDir`. Public so a
    * batch backfill can reuse the exact streaming merge path. No-op when
    * `batchId` was already applied (checkpoint replay after a flip). */
  def mergeBatch(batch: DataFrame, mvDir: String, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val cur = currentVersion(mvDir)
    if (cur.exists(_._1 >= batchId)) return
    val partials = graft.queries.RelQueries.dayTypePartials(batch)
    val merged = cur match {
      case Some((_, path)) =>
        // re-collapse to PARTIALS (n/s), not the scaled final form — the
        // stored table must stay addition-mergeable for the next batch
        spark.read.parquet(path).unionByName(partials)
          .groupBy("day", "event_type")
          .agg(org.apache.spark.sql.functions.sum("n").as("n"),
            org.apache.spark.sql.functions.sum("s").as("s"))
      case None => partials
    }
    val next = s"$mvDir/v$batchId"
    merged.write.mode("overwrite").parquet(next)
    val tmp = java.nio.file.Paths.get(mvDir, s"_current.tmp$batchId")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(mvDir))
    java.nio.file.Files.writeString(tmp, s"$batchId\t$next")
    java.nio.file.Files.move(tmp, pointerPath(mvDir),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    // GC: the just-superseded version may still be mid-scan by a reader
    // that resolved the old pointer — keep it one generation, delete
    // anything older (the compactDaily never-in-place discipline).
    cur.foreach { case (_, keep) =>
      val dir = new java.io.File(mvDir)
      Option(dir.listFiles()).getOrElse(Array.empty)
        .filter(f => f.isDirectory && f.getName.startsWith("v") &&
          f.getPath != next && f.getPath != keep)
        .foreach(f => graft.queries.AtRestTables.deleteRecursively(f.getPath))
    }
  }

  /** Start the continuous MV-maintenance sink over an events stream
    * (columns: `ts` + `event_type` + `value`, same contract as the batch
    * surfaces — tsUs dispatches the carrier type). */
  def daily(events: DataFrame, mvDir: String, checkpoint: String): StreamingQuery =
    events.writeStream
      .foreachBatch((batch: DataFrame, id: Long) => mergeBatch(batch, mvDir, id))
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .start()
}
