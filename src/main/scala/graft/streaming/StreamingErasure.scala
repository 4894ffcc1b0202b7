package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming maintenance of the q304 erasure store — the FORGETTING leg
  * of the ingestion lifecycle, beside [[StreamingPostingsAppend]] (which
  * adds documents to the index) and [[StreamingIvfEncode]] (vectors):
  * GDPR erasure REQUESTS (doc ids) arrive as a stream, and each
  * micro-batch lands the three decremental artifacts the q304 serve
  * consumes — tombstone ids, per-term df decrements (tokenized from the
  * erased docs ONLY, so a batch costs O(|batch's docs|)), and the
  * (n_erased, sum_dl_erased) length-stat decrement. The serve-side
  * arithmetic is THE q304 definition
  * ([[graft.queries.TextQueries.erasedBm25Serve]]), so the
  * stream-maintained forget state cannot drift from the batch purge —
  * StreamingErasureSpec replays the full cohort through shuffled,
  * OVERLAPPING micro-batches and proves the accumulated store and the
  * served BM25 bit-equal to q304's.
  *
  * Idempotence, in both directions a request stream needs:
  *  - a REPLAYED micro-batch id (at-least-once foreachBatch) overwrites
  *    its own `batch=<id>/` directories with identical bytes (the
  *    [[StreamingIvfEncode]] id-keyed idiom) — prior-batch tombstones are
  *    consulted with `batch < id`, so the replay recomputes exactly what
  *    the original run computed;
  *  - a DUPLICATE request in a later batch anti-joins away against the
  *    already-landed tombstones: erasing twice must not decrement twice
  *    (a double df decrement corrupts the lexicon for every query that
  *    touches the term).
  *
  * Read-side publish atomicity: a batch's three directories land in
  * sequence, so a crash can leave a half-landed batch (tombstones
  * committed, decrements absent — the exact half-forgotten hazard
  * AtRestFaultSpec pins for the at-rest build). [[readStore]] therefore
  * serves ONLY batch ids present in all three subdirectories; the
  * replayed batch completes the set and becomes visible atomically. */
object StreamingErasure {

  /** The q148 tokenize (filter-nonempty formulation — the engine-wide
    * invariant), for the per-doc length the stat decrement needs. */
  private def toksC = graft.queries.QueryBase.toksCol

  /** Tombstone ids already landed by COMMITTED batches BEFORE `batchId`
    * (None when none committed yet). The strict `<` keeps a replayed id
    * from anti-joining against its own previous run's output, and the
    * committed-id restriction keeps a FIRST-batch crash from wedging the
    * stream: a torn tomb/batch=0 directory holds only `_temporary` trash,
    * and an unguarded parquet read of the root would throw
    * schema-inference errors on every replay forever. */
  private def priorTombstones(spark: SparkSession, outDir: String,
                              batchId: Long): Option[DataFrame] = {
    val ok = landedIds(outDir, "tomb").filter(_ < batchId)
    if (ok.isEmpty) None
    else Some(spark.read.parquet(s"$outDir/tomb")
      .where(col("batch").isin(ok.toSeq: _*)).select("doc_id"))
  }

  /** Land one micro-batch of erasure requests against the static
    * documents relation (exposed separately so the replay and crash
    * paths are testable). */
  def writeBatch(reqs: DataFrame, docs: DataFrame,
                 outDir: String, batchId: Long): Unit = {
    val spark = reqs.sparkSession
    // a FULLY-published batch replays as a no-op: its content is a
    // deterministic function of (requests, committed prior batches), so
    // rewriting could only reproduce the same bytes — and the overwrite
    // would first DELETE tomb/batch=N's marker, transiently un-publishing
    // the batch from the all-three intersection mid-replay (erased docs
    // would serve again for the rewrite's duration)
    if (Seq("tomb", "dfdec", "dlstat").forall(s =>
        new java.io.File(s"$outDir/$s/batch=$batchId/_SUCCESS").isFile))
      return
    val ids0 = reqs.select("doc_id").distinct()
    val ids = priorTombstones(spark, outDir, batchId)
      .map(p => ids0.join(p, Seq("doc_id"), "left_anti")).getOrElse(ids0)
      .cache()
    try {
      ids.write.mode("overwrite").parquet(s"$outDir/tomb/batch=$batchId")
      val erased = docs.join(broadcast(ids), Seq("doc_id"), "left_semi")
      graft.queries.TextQueries.postingsOf(erased)
        .groupBy("term").agg(count(lit(1)).as("ddf"))
        .write.mode("overwrite").parquet(s"$outDir/dfdec/batch=$batchId")
      erased.select(size(toksC).cast("long").as("dl"))
        .agg(count(lit(1)).as("n_erased"),
          coalesce(sum("dl"), lit(0L)).cast("long").as("sum_dl_erased"))
        .write.mode("overwrite").parquet(s"$outDir/dlstat/batch=$batchId")
    } finally ids.unpersist()
  }

  /** Start maintaining the erasure store for a stream of (doc_id)
    * requests against the static documents relation. */
  def start(reqs: DataFrame, docs: DataFrame, outDir: String,
            checkpoint: String): StreamingQuery =
    reqs.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .foreachBatch { (df: Dataset[Row], id: Long) =>
        writeBatch(df, docs, outDir, id)
      }
      .start()

  /** Batch ids whose directory COMMITTED under `sub` (the
    * [[IdKeyedStore]] `_SUCCESS` discipline) — counting a bare torn
    * directory would let [[readStore]]'s all-three intersection admit a
    * half-written batch (the crash-during-the-THIRD-write window, where
    * tomb and dfdec are complete and only dlstat is torn). */
  private def landedIds(outDir: String, sub: String): Set[Long] =
    IdKeyedStore.committedIds(s"$outDir/$sub")

  /** The accumulated store, restricted to FULLY-landed batches (ids
    * present in all three subdirectories — see the publish-atomicity
    * note above): merged tombstone ids, per-term df decrements summed
    * across batches (decrements are additive, the q138 integer-partial
    * discipline), and the one-row total stat decrement (zeros when no
    * batch landed). */
  def readStore(spark: SparkSession, outDir: String)
      : (DataFrame, DataFrame, DataFrame) = {
    val ok = landedIds(outDir, "tomb")
      .intersect(landedIds(outDir, "dfdec"))
      .intersect(landedIds(outDir, "dlstat"))
    def committed(sub: String): Option[DataFrame] =
      if (ok.isEmpty) None
      else Some(spark.read.parquet(s"$outDir/$sub")
        .where(col("batch").isin(ok.toSeq: _*)).drop("batch"))
    import spark.implicits._
    val tomb = committed("tomb")
      .getOrElse(Seq.empty[Long].toDF("doc_id"))
    val dec = committed("dfdec")
      .map(_.groupBy("term").agg(sum("ddf").as("ddf")))
      .getOrElse(Seq.empty[(String, Long)].toDF("term", "ddf"))
    val stat = committed("dlstat")
      .map(_.agg(coalesce(sum("n_erased"), lit(0L)).cast("long").as("n_erased"),
        coalesce(sum("sum_dl_erased"), lit(0L)).cast("long").as("sum_dl_erased")))
      .getOrElse(Seq((0L, 0L)).toDF("n_erased", "sum_dl_erased"))
    (tomb, dec, stat)
  }
}
