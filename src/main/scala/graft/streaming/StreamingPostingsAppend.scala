package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming maintenance of the q148 at-rest inverted index — the TEXT
  * leg of the ingestion lifecycle beside [[StreamingIvfEncode]] (vectors)
  * and [[PartitionedIngest]] (events): newly-arriving documents are
  * tokenized into (term, doc_id, tf) postings AS THEY LAND and appended
  * to the posting store. The derivation is THE q148 build definition
  * ([[graft.queries.TextQueries.postingsOf]]), so the stream-maintained
  * index is row-identical to a from-scratch rebuild by construction — at
  * 100 TB the difference between absorbing a document firehose and
  * re-tokenizing a corpus under it. The lexicon (term, df) is derived
  * stats (the q141 manifest discipline): serving re-derives or
  * periodically compacts it from the postings, never the raw text.
  *
  * Append protocol: [[StreamingIvfEncode]]'s id-keyed-directory idiom —
  * each micro-batch writes under `batch=<id>/`; a replayed id
  * (at-least-once foreachBatch) overwrites its own directory with
  * identical bytes, so the append is idempotent without a table format.
  *
  * StreamingPostingsSpec replays the corpus through micro-batches and
  * proves the accumulated postings row-identical to the one-shot batch
  * derivation, and a conjunctive probe over them equal to one over the
  * batch index. */
object StreamingPostingsAppend {

  /** Tokenize one micro-batch of (doc_id, text) rows and land its
    * postings under the id-keyed directory (exposed separately so the
    * replay path is testable). */
  def writeBatch(batch: DataFrame, outDir: String, batchId: Long): Unit =
    graft.queries.TextQueries.postingsOf(batch)
      .write.mode("overwrite").parquet(s"$outDir/batch=$batchId")

  /** Start appending postings for a stream of (doc_id, text) rows. */
  def start(docs: DataFrame, outDir: String, checkpoint: String): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .foreachBatch { (df: Dataset[Row], id: Long) =>
        writeBatch(df, outDir, id)
      }
      .start()

  /** The store's served schema — the (term, doc_id, tf) posting contract
    * [[writeBatch]] lands (StreamingPostingsSpec pins constant == landed
    * bytes), so a reader racing the first micro-batch gets an EMPTY
    * store of the right shape instead of a crash. */
  val storeSchema: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("term",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("tf",
        org.apache.spark.sql.types.LongType, nullable = false)))

  /** The accumulated posting store (all landed batches; the discovery
    * column `batch` is the lineage tag, dropped for serving reads). */
  def readPostings(spark: SparkSession, outDir: String): DataFrame =
    IdKeyedStore.readCommitted(spark, outDir, Some(storeSchema))

  /** Compact the per-batch directories into one term-clustered layout —
    * the [[PartitionedIngest.compactDaily]] discipline for the text leg:
    * a long-running append stream leaves one small file per micro-batch
    * (the small-files problem), and the periodic compaction rewrites
    * them into few term-range-clustered files a serving scan reads
    * efficiently. The rewrite merges per-(term, doc_id) tf partials by
    * SUM — the q138 additive-partial discipline (an identity here, since
    * each document lands whole in one batch and replays overwrite their
    * own directory, but the correct general semantics if a landing ever
    * shards one doc's postings). Row-identity with the uncompacted store
    * is spec-pinned. */
  def compact(spark: SparkSession, inDir: String, outDir: String): Unit =
    readPostings(spark, inDir)
      .groupBy("term", "doc_id")
      .agg(org.apache.spark.sql.functions.sum("tf").as("tf"))
      .repartitionByRange(4, org.apache.spark.sql.functions.col("term"))
      .write.mode("overwrite").parquet(outDir)
}
