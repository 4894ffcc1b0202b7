package graft.streaming

import org.apache.spark.sql.DataFrame

/** Streaming sketch maintenance: the q108 HyperLogLog registers kept LIVE
  * over an unbounded item stream.
  *
  * Registers only ever grow under max, so a Complete/Update-mode
  * aggregation's state IS the register table — at most 2^8 = 256 rows
  * forever, regardless of how many items stream through. That makes this
  * the constant-memory "distinct count so far" monitor a 100 TB ingest
  * pipeline runs next to its batch jobs (the KMV/CMS sketches stream the
  * same way: their merge operators — min-set union and + — are likewise
  * aggregation-friendly).
  *
  * The bucket/rank derivation is [[graft.queries.DedupQueries.hllRegisters]]
  * itself — ONE definition feeds the batch query, its DuckDB oracle and
  * this stream, so the surfaces cannot drift; the replay spec asserts the
  * streamed registers equal the batch ones over the real fixture corpus,
  * and the batch estimator formula applies to any snapshot of the sink.
  */
object SketchStreaming {

  /** Live HLL register table (bucket, r) for a (possibly streaming) frame's
    * string item column. Use `outputMode("complete")` — the result is the
    * bounded register table, re-emitted per trigger. */
  def hllRegisters(items: DataFrame, itemCol: String): DataFrame =
    graft.queries.DedupQueries.hllRegisters(items, itemCol)

  /** Live count-min counter table (i, p, cnt) — the q109 CMS maintained
    * over a stream. Counts merge under plain +, so Complete-mode state is
    * the bounded d·w counter table (≤ 3·1024 rows forever) and ANY
    * snapshot is exactly the batch CMS of everything streamed so far:
    * probe it with q109's min-over-rows and the never-undercount
    * guarantee holds mid-stream. */
  def cmsCounters(items: DataFrame, itemCol: String): DataFrame =
    graft.queries.DedupQueries.cmsCounters(items, itemCol)

  /** Live log-domain quantile sketch (bin, cnt, vmin, vmax) — q130's
    * DDSketch-style bins maintained over a stream of `value` rows. This
    * is the sketch the q118 histogram could never stream (its equal-width
    * bins need the data's [lo, hi] up front); the fixed log grid needs
    * nothing, and all three bin aggregates merge under aggregation-
    * friendly operators (+, min, max), so Complete-mode state is the
    * bounded bin table (≈ ln(dynamic range)/w rows forever) and ANY
    * snapshot is exactly the batch sketch of everything streamed so far —
    * probe it with q130's cumulative-rank interpolation and the
    * |est − exact| ≤ (vmax − vmin)/2 theorem holds mid-stream. */
  def ddSketchBins(values: DataFrame): DataFrame =
    graft.queries.RelQueries.ddSketch(values)

  /** Live per-(label, half, dim) centroid component sums — q254's drift
    * monitor maintained over a stream of (vec_id, label, embedding) rows.
    * Both aggregates merge under +, so Complete-mode state is the bounded
    * |labels|·2·dim sum table and ANY snapshot run through q254's tail
    * (mean → quantized per-dim products → cosine) is exactly the batch
    * drift readout of everything streamed so far. */
  def centroidSums(vecs: DataFrame): DataFrame =
    graft.queries.VectorQueries.centroidSums(vecs)
}
