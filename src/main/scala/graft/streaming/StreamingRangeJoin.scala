package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming range join — q119's |Δts| ≤ τ event correlation kept live as
  * a watermarked stream-stream self-join (the event-correlation monitor a
  * pipeline runs next to the batch q119 backfill).
  *
  * The join's time-range predicate is on the WATERMARKED event-time
  * columns — that is the condition under which Spark bounds BOTH sides'
  * join state to the τ + lateness horizon instead of the whole stream
  * history (state ∝ arrival rate × horizon, the only admissible shape at
  * 100 TB; the replay spec pins the eviction). Inner join, so a pair
  * emits once both sides have arrived; with in-order replay and a
  * lateness ≥ τ no pair is lost, which the spec proves by bit-equality
  * with the batch pair set.
  *
  * `withWatermark` is a no-op on a batch frame, so the SAME definition
  * produces the batch pairs — one formulation, both surfaces, the
  * q108/q109 shared-builder discipline applied to a join.
  */
object StreamingRangeJoin {

  /** The batch q119 radius ([[graft.queries.RelQueries.RangeTauUs]], µs)
    * in this operator's seconds unit — ONE shared constant, so the
    * streaming monitor cannot drift from the batch backfill. */
  val DefaultTauSec: Long = graft.queries.RelQueries.RangeTauUs / 1000000L

  /** (p_eid, n_eid) pairs with |Δet| ≤ tauSec and equal user_id, from a
    * frame with (event_id, user_id, ts) — streaming or batch. `ts` may be
    * TIMESTAMP/TIMESTAMP_NTZ or legacy integer ns
    * ([[graft.queries.QueryBase.tsUs]] dispatches on the schema). */
  def pairs(events: DataFrame, lateness: String): DataFrame =
    pairs(events, DefaultTauSec, lateness)

  def pairs(events: DataFrame, tauSec: Long, lateness: String): DataFrame = {
    val base = events.select(col("event_id"), col("user_id"),
      timestamp_micros(graft.queries.QueryBase.tsUs(events)).as("et"))
    val a = base.withWatermark("et", lateness).alias("a")
    val b = base.withWatermark("et", lateness).alias("b")
    a.join(b, expr(
      s"""a.user_id = b.user_id AND a.event_id <> b.event_id AND
         |b.et BETWEEN a.et - INTERVAL $tauSec SECOND AND a.et + INTERVAL $tauSec SECOND""".stripMargin))
      .select(col("a.event_id").as("p_eid"), col("b.event_id").as("n_eid"))
  }
}
