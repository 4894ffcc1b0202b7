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

  /** Batch ids with ANY directory present under `dir` — committed or
    * torn (no `_SUCCESS`, crash debris awaiting replay). The compaction
    * contiguity guard needs the distinction: a torn id is a batch that
    * was ATTEMPTED but has not landed, and a generation must never roll
    * coverage past it (the coverage check would then skip its replay
    * forever — silent request loss). */
  def presentIds(spark: SparkSession, dir: String): Set[Long] = {
    val (fs, p) = fsOf(spark, dir)
    if (!fs.exists(p) || !fs.getFileStatus(p).isDirectory) Set.empty
    else fs.listStatus(p).toIndexedSeq
      .filter(_.isDirectory)
      .flatMap(st => "batch=(\\d+)".r.findFirstMatchIn(st.getPath.getName)
        .map(_.group(1).toLong))
      .toSet
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

/** The COMPACTION side of the id-keyed protocol — ONE generational
  * discipline for every streaming maintenance store here (the text
  * erasure triple, the ANN/mm tombstones, the MV decrement pair): a
  * long-lived stream otherwise accumulates one tiny `batch=<id>/`
  * directory (per artifact) per micro-batch forever, growing the
  * directory listing and the read-side `isin` literal without bound.
  * Rolling every fully-landed batch into a GENERATION bounds both.
  *
  * A generation is itself id-keyed: one `batch=<coveredId>/` directory
  * per artifact under `gen/`, committed by the same `_SUCCESS` markers —
  * so a compaction killed between its artifact writes leaves a partial
  * generation the all-artifact intersection keeps invisible until the
  * re-run completes it (exactly the torn-batch rule, applied one level
  * up). The ACTIVE generation is the largest fully-committed id; readers
  * resolve it FIRST, then list loose batches above its coverage, and the
  * keep-one GC lag (the just-superseded generation and the loose batches
  * only IT covers survive one more compaction) guarantees that order can
  * never observe a hole. Replay idempotence survives the roll-up: a
  * replayed batch id at or below the active coverage must no-op on the
  * generation check even after its own directories are garbage-collected
  * — every store's writeBatch consults [[activeGeneration]] before its
  * per-batch `_SUCCESS` probe.
  *
  * Single-maintainer discipline (the [[MvMaintenance]] assumption): one
  * compactor runs at a time — the streaming `compactEvery` hook
  * guarantees it by construction (foreachBatch is serial), and an
  * external tick must not race it. Concurrent WRITERS of new batches
  * are safe: compaction never touches ids above its claimed coverage.
  *
  * `subs`: the store's artifact subdirectories; `""` means the store's
  * batches land at the root (single-artifact stores). */
private[streaming] final class GenerationalStore(
    outDir: String, subs: Seq[String]) {

  private def dataPath(sub: String): String =
    if (sub.isEmpty) outDir else s"$outDir/$sub"
  private def genPath(sub: String): String =
    if (sub.isEmpty) s"$outDir/gen" else s"$outDir/gen/$sub"

  /** Batch ids fully landed across every artifact (the torn-batch
    * intersection), loose only — ids at or below `gen`'s coverage are
    * excluded. `gen` is the generation the CALLER already resolved (via
    * [[activeGeneration]]): the (generation, loose-id) pair a reader
    * serves must be resolved as ONE consistent snapshot — re-resolving
    * the generation here could pair an OLD generation with loose ids
    * filtered against a NEWER one that a racing compaction just
    * published, silently dropping every batch in (old, new] from the
    * served state. Threading the caller's gen makes the pair consistent
    * by construction (the r17 ADVICE). */
  def looseIds(spark: SparkSession, gen: Option[Long]): Set[Long] =
    subs.map(s => IdKeyedStore.committedIds(spark, dataPath(s)))
      .reduce(_ intersect _)
      .filter(id => gen.forall(id > _))

  /** The loose ids a compaction may safely roll up: the committed ids
    * above `gen`'s coverage, truncated below the smallest TORN id (a
    * batch directory present in some artifact without its `_SUCCESS`, or
    * committed in only a subset of the artifacts). Covering a torn id
    * would make [[batchApplied]] return true for a batch whose replay
    * has not landed yet — its requests would be skipped forever (silent
    * data loss, the r17 ADVICE). Under serial foreachBatch ids the torn
    * id is always the newest in-flight batch and the truncation is a
    * no-op; the guard exists for the OUT-OF-ORDER writer / external
    * compaction tick the scaladoc contract forbids but cannot enforce. */
  def compactableIds(spark: SparkSession, gen: Option[Long]): Set[Long] = {
    val committed = looseIds(spark, gen)
    val torn = subs.map(s => IdKeyedStore.presentIds(spark, dataPath(s)))
      .reduce(_ union _)
      .filter(id => gen.forall(id > _)) -- committed
    if (torn.isEmpty) committed
    else {
      val cut = torn.min
      val safe = committed.filter(_ < cut)
      org.apache.log4j.Logger.getLogger(getClass).warn(
        s"graft: compaction of $outDir truncated below torn batch $cut " +
          s"(skipping ${committed.size - safe.size} committed ids above it " +
          "until the torn batch's replay lands)")
      safe
    }
  }

  /** The active generation's covered-through id — the largest id
    * committed in EVERY artifact's gen directory. */
  def activeGeneration(spark: SparkSession): Option[Long] = {
    val ok = subs.map(s => IdKeyedStore.committedIds(spark, genPath(s)))
      .reduce(_ intersect _)
    if (ok.isEmpty) None else Some(ok.max)
  }

  /** Whether `batchId`'s write may be skipped: already rolled into the
    * active generation, or fully committed loose. */
  def batchApplied(spark: SparkSession, batchId: Long): Boolean =
    activeGeneration(spark).exists(batchId <= _) ||
      subs.forall(s =>
        IdKeyedStore.batchCommitted(spark, dataPath(s), batchId))

  /** One artifact's accumulated content over an EXPLICIT (generation,
    * loose-id) pair — None when neither exists. Callers pass the SAME
    * pair to every artifact read (and compaction passes the pair its new
    * generation claims to cover). */
  def readPart(spark: SparkSession, sub: String,
               gen: Option[Long], ok: Set[Long]): Option[DataFrame] = {
    val rolled = gen.map(g => spark.read.parquet(s"${genPath(sub)}/batch=$g"))
    // EXPLICIT committed leaf directories, never a root read: partition
    // discovery over the root would trip on the `gen/` sibling (mixed
    // directory depths), and listing exactly the committed ids also
    // drops the root-scan + isin-literal cost the compaction bounds
    val loose =
      if (ok.isEmpty) None
      else Some(spark.read.parquet(
        ok.toSeq.sorted.map(id => s"${dataPath(sub)}/batch=$id"): _*))
    (rolled, loose) match {
      case (Some(r), Some(l)) => Some(r.unionByName(l))
      case (r, l) => r.orElse(l)
    }
  }

  /** Land a new generation (per-artifact roll-up frames keyed by sub)
    * covering through `covered`, then garbage-collect with the keep-one
    * lag. The artifact writes commit in `subs` order; the generation
    * becomes active only when the last one lands. */
  def writeGeneration(spark: SparkSession, covered: Long,
                      prev: Option[Long],
                      parts: Map[String, DataFrame]): Unit = {
    subs.foreach { s =>
      parts(s).write.mode("overwrite")
        .parquet(s"${genPath(s)}/batch=$covered")
    }
    val fs = new org.apache.hadoop.fs.Path(outDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    subs.foreach { s =>
      IdKeyedStore.committedIds(spark, genPath(s))
        .filter(g => g != covered && prev.forall(g != _))
        .foreach(g => fs.delete(
          new org.apache.hadoop.fs.Path(s"${genPath(s)}/batch=$g"), true))
      prev.foreach { p =>
        IdKeyedStore.committedIds(spark, dataPath(s)).filter(_ <= p)
          .foreach(id => fs.delete(
            new org.apache.hadoop.fs.Path(s"${dataPath(s)}/batch=$id"), true))
      }
    }
  }
}
