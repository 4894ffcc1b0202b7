package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Stream-static dimension enrichment — the most common production
  * streaming pattern, completing the streaming-join surface beside
  * [[StreamingRangeJoin]] (stream×stream): every arriving event picks up
  * its customer dimension attributes by a LEFT join against the static
  * table, which Spark plans as a BroadcastHashJoin INSIDE each
  * micro-batch (the dim ships to executors once per batch; no state, no
  * watermark, no shuffle of the stream — the enrichment is map-side,
  * which is why this shape absorbs any event rate the cluster can scan).
  * Unmatched users keep their rows with a sentinel segment (left-join
  * semantics — an enrichment must never DROP telemetry).
  *
  * The join definition is shared by the batch path so
  * StreamingEnrichSpec can prove replay equality exactly. */
object StreamingEnrich {

  /** The enrichment join — ONE definition for the streaming and batch
    * sides (events may be a streaming or a static frame). */
  def enriched(events: DataFrame, customers: DataFrame): DataFrame = {
    val dim = customers.select(col("c_custkey"), col("c_mktsegment"))
    events.join(broadcast(dim), events("user_id") === dim("c_custkey"), "left")
      .select(events("event_id"), events("user_id"), events("event_type"),
        coalesce(dim("c_mktsegment"), lit("UNKNOWN")).as("segment"))
  }

  /** Start enriching a stream of event rows against the static dim,
    * landing enriched rows in a named memory sink (tests) or any sink
    * the caller retargets. */
  def start(events: DataFrame, customers: DataFrame,
            sinkName: String, checkpoint: String): StreamingQuery =
    enriched(events, customers).writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .format("memory")
      .queryName(sinkName)
      .start()
}
