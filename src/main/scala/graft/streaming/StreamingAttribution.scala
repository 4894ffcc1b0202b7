package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** q318's pipeline drop attribution LIVE — the data-side EXPLAIN of the
  * training funnel maintained as documents arrive, instead of recomputed
  * over the corpus after the fact. Each arriving document is attributed
  * to the FIRST stage that drops it (language → quality → exact-dup →
  * near-dup → kept) through the SAME arithmetic as the batch report:
  * the per-doc signals are [[graft.queries.TextQueries.pipelineFeatureFrame]]
  * (the q294 projection), the gate is the shared `pipeIsQual`, the
  * stage chain is the shared `attributionStageCol`, and the readout
  * aggregates through the shared `attributionReport` — so the live
  * report and the oracle-gated q318 cannot drift.
  *
  * Live canonical semantics are FIRST-SEEN ([[StreamingDedup]]'s
  * contract): the earliest quality-passing arrival of a content hash is
  * its exact canonical, and the earliest elected exact canonical of a
  * simhash is its near-dup canonical — within a micro-batch, ties break
  * to the smallest doc_id, so replaying the corpus in doc_id order
  * reproduces the batch report's min-doc_id canonicals BIT-EXACTLY
  * (StreamingAttributionSpec proves it, share rounding included). Under
  * out-of-order arrival the elected canonical may differ from batch
  * min-doc_id (two raw texts can share a normalized hash but carry
  * different simhashes), which is the defined live behavior, not a bug.
  *
  * Store protocol: [[GenerationalStore]] over three parts landed per
  * micro-batch — `att` (doc_id, stage, pred_lang, n_tokens: this batch's
  * attributions), `ecan` (h, doc_id: exact canonicals ELECTED this
  * batch), `ncan` (simhash, doc_id: near canonicals elected this batch)
  * — so a batch is visible only when all three subdirectories committed
  * (torn batches invisible), a replayed id no-ops (its content is a
  * deterministic function of the batch's rows and committed prior
  * batches), and the roll-up keeps the store bounded under an unbounded
  * document firehose. Each batch's election anti-joins ONLY the
  * committed prior `ecan`/`ncan` keys — O(batch + canonical-store), no
  * corpus rescan; at 100 TB the canonical stores are the dedup state a
  * production firehose keeps anyway, range-clustered by key at each
  * roll-up so the per-batch anti join prunes to the probed key ranges.
  *
  * Erasure story (the [[StreamingStateErasure]] census does not apply —
  * no GroupState; all cross-batch state is at rest): the store is
  * doc-keyed in `att` and content-keyed in `ecan`/`ncan`, so forgetting
  * a document is the q314 rewrite class — anti-join the cohort out of
  * `att` at a roll-up, and depose its hashes from `ecan`/`ncan` exactly
  * as [[StreamingDedup]]'s forgetting leg deposes an erased canonical
  * (re-arriving content then elects a fresh survivor).
  *
  * Reference context: the attribution stages mirror the reference's
  * filter-cascade reading of corpus prep (symtseries has no pipeline
  * analogue; the stage arithmetic is q294's, see TextQueries). */
object StreamingAttribution {

  private val Subs = Seq("att", "ecan", "ncan")

  /** The store's generational-compaction state (ONE discipline with the
    * erasure and postings stores — see [[GenerationalStore]]). */
  private def store(outDir: String) = new GenerationalStore(outDir, Subs)

  /** The served attribution schema — a reader racing the first
    * micro-batch gets an EMPTY frame of the right shape, not a crash. */
  val attSchema: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("stage",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("pred_lang",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("n_tokens",
        org.apache.spark.sql.types.IntegerType)))

  /** Attribute one micro-batch of (doc_id, text) rows against the
    * committed prior canonical state and land the (att, ecan, ncan)
    * triple (exposed separately so the replay and crash paths are
    * testable). An APPLIED id — rolled into the active generation or
    * fully committed loose — replays as a no-op: its content is a
    * deterministic function of (batch rows, committed priors), and the
    * overwrite would transiently un-publish the batch mid-replay. */
  def writeBatch(docs: DataFrame, outDir: String, batchId: Long): Unit = {
    val spark = docs.sparkSession
    val st = store(outDir)
    if (st.batchApplied(spark, batchId)) return
    // committed prior state STRICTLY below this id — a replayed id must
    // not anti-join against its own previous (possibly torn) run
    val gen = st.activeGeneration(spark)
    val ok = st.looseIds(spark, gen).filter(_ < batchId)
    val feat = graft.queries.TextQueries.pipelineFeatureFrame(docs).cache()
    try {
      val q = feat.where(graft.queries.TextQueries.pipeIsQual)
      val priorE = st.readPart(spark, "ecan", gen, ok).map(_.select("h"))
      val priorN = st.readPart(spark, "ncan", gen, ok).map(_.select("simhash"))
      // exact canonicals elected THIS batch: min doc_id per content hash
      // among quality-passing docs whose hash no committed batch has seen
      // no broadcast hint on the prior store: it grows with the corpus
      // (the batch is the SMALL side of this anti join). The roll-up
      // range-clusters it by probe key, so Spark's runtime bloom filter
      // plus row-group min/max stats prune the store scan to the key
      // ranges this batch actually probes — O(batch) effective work.
      val newE = priorE.map(p => q.join(p, Seq("h"), "left_anti"))
        .getOrElse(q)
        .groupBy("h").agg(min("doc_id").as("doc_id"))
      val ekDocs = q.join(newE, Seq("h", "doc_id"), "left_semi")
      // near canonicals elected this batch: min doc_id per simhash among
      // the freshly-elected exact canonicals with an unseen simhash
      val newN = priorN.map(p =>
          ekDocs.join(p, Seq("simhash"), "left_anti"))
        .getOrElse(ekDocs)
        .groupBy("simhash").agg(min("doc_id").as("doc_id"))
      val nkDocs = ekDocs.join(newN, Seq("simhash", "doc_id"), "left_semi")
      val att = feat
        .join(ekDocs.select(col("doc_id"), lit(1L).as("__ex")),
          Seq("doc_id"), "left")
        .join(nkDocs.select(col("doc_id"), lit(1L).as("__nr")),
          Seq("doc_id"), "left")
        .select(col("doc_id"),
          graft.queries.TextQueries.attributionStageCol(
            col("__ex").isNotNull, col("__nr").isNotNull).as("stage"),
          col("pred_lang"), col("n_tokens"))
      att.write.mode("overwrite").parquet(s"$outDir/att/batch=$batchId")
      newE.write.mode("overwrite").parquet(s"$outDir/ecan/batch=$batchId")
      newN.write.mode("overwrite").parquet(s"$outDir/ncan/batch=$batchId")
    } finally { feat.unpersist(); () }
  }

  /** Start attributing a stream of (doc_id, text) rows. `compactEvery`
    * wires the generational roll-up into the stream (every k-th batch) —
    * no external maintenance tick needed to stay bounded. */
  def start(docs: DataFrame, outDir: String, checkpoint: String,
            compactEvery: Option[Long] = None): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .foreachBatch { (df: Dataset[Row], id: Long) =>
        writeBatch(df, outDir, id)
        if (compactEvery.exists(k => k > 0 && (id + 1) % k == 0)) {
          compactStore(df.sparkSession, outDir); ()
        }
      }
      .start()

  /** The accumulated per-doc attributions: the active generation plus
    * fully-committed loose batches above its coverage — a plain union is
    * exact because each document lands whole in exactly one batch. */
  def readAttribution(spark: SparkSession, outDir: String): DataFrame = {
    val st = store(outDir)
    val gen = st.activeGeneration(spark)
    st.readPart(spark, "att", gen, st.looseIds(spark, gen))
      .getOrElse(spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row], attSchema))
  }

  /** The live q318 report — the shared `attributionReport` aggregation
    * over the accumulated attributions, bit-identical to the batch
    * report after an in-order replay of the same corpus. */
  def report(spark: SparkSession, outDir: String): DataFrame =
    graft.queries.TextQueries.attributionReport(
      readAttribution(spark, outDir).select("stage", "pred_lang", "n_tokens"))

  /** Roll every fully-landed batch into one generation so the directory
    * count and the read-side id `isin` stay bounded. Attributions are
    * disjoint by doc and canonicals disjoint by key across batches, so
    * the roll-up is a union, range-clustered for serving: `att` by
    * doc_id (the audit-scan layout), `ecan`/`ncan` by their probe keys
    * so the per-batch anti join prunes. Returns the active coverage. */
  def compactStore(spark: SparkSession, outDir: String): Option[Long] = {
    val st = store(outDir)
    val prev = st.activeGeneration(spark)
    val live = st.compactableIds(spark, prev)
    if (live.isEmpty) return prev
    def part(sub: String): DataFrame = st.readPart(spark, sub, prev, live).get
    st.writeGeneration(spark, live.max, prev, Map(
      "att" -> part("att").repartitionByRange(4, col("doc_id")),
      "ecan" -> part("ecan").repartitionByRange(4, col("h")),
      "ncan" -> part("ncan").repartitionByRange(4, col("simhash"))))
    Some(live.max)
  }
}
