package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, KeyValueGroupedDataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Erasure for LIVE per-user state — the r17 verdict's #4: every at-rest
  * artifact now forgets, but a user-keyed stateful stream
  * ([[SaxStreaming]]'s ring, [[StreamingFunnel]]'s firsts, the
  * sessions/survival/drift/acf modules — all the same
  * `groupByKey(userId).flatMapGroupsWithState` shape) retained an erased
  * user's GroupState forever. This module wires erasure REQUESTS into
  * that shape as in-band control records and removes the key's state via
  * `GroupState.remove()` — the checkpoint state store then physically
  * drops the key at the batch commit, exactly like a tombstoned at-rest
  * row leaving a compacted generation.
  *
  * Semantics (ONE rule for every leg, so the proofs compose):
  *  - a micro-batch containing a forget signal for key k REMOVES k's
  *    state and suppresses k's output for that batch entirely — the
  *    forget wins the batch, making the result independent of the
  *    intra-batch interleave of data and control records (both arrive
  *    through one union, so Spark gives no ordering between them);
  *  - SUBSEQUENT records for an erased key must be dropped at the door
  *    by [[erasureGate]] (a stream-static anti join against the at-rest
  *    erasure store — the q304/q306 store IS the gate's dimension).
  *    With the gate in place, the forgetting stream's post-erasure
  *    output is bit-equal to a stream that never saw the cohort
  *    (StreamingStateErasureSpec proves it for both legs, across
  *    kill/restart), because per-key state is independent and the
  *    erased keys contribute neither state nor rows;
  *  - the state store itself holds NO record that the key ever existed —
  *    deliberately: a "was erased" marker in state would BE a retained
  *    cohort key. The durable forget list is the at-rest erasure store,
  *    whose own retention is governed by the q311 ledger
  *    (`retire_after_compaction`).
  *
  * Idempotence: a duplicate forget removes absent state (a no-op), and a
  * replayed micro-batch re-applies the same remove — `GroupState`
  * commits are transactional with the batch, so at-least-once replay
  * converges (the restart leg of the spec kills a query between the
  * forget batch and its successor).
  */
object StreamingStateErasure {

  /** An erasure request for a user-keyed stream. */
  final case class Forget(userId: Long)

  /** Drop an erased cohort's records at the ingest door: the
    * stream-static anti join against the at-rest erased-user store (one
    * broadcastable id column). This is what makes "never saw the
    * cohort" hold for every batch AFTER the store landed; the in-band
    * signal handles the state that predates it. */
  def erasureGate(events: DataFrame, erasedUsers: DataFrame): DataFrame =
    events.join(broadcast(erasedUsers.select(col("user_id"))),
      events("user_id") === erasedUsers("user_id"), "left_anti")

  /** The forgetting wrapper around any per-key stateful update function:
    * `inner` is the module's existing (key, rows, state) body, untouched
    * — forgetting composes AROUND the business logic, so every user-keyed
    * module adopts it without re-deriving its state algebra. */
  private def forgetting[E, S, O: Encoder](
      keyed: KeyValueGroupedDataset[Long, (Boolean, E)],
      mode: OutputMode,
      inner: (Long, Iterator[E], GroupState[S]) => Iterator[O])(
      implicit stateEnc: Encoder[S]): Dataset[O] =
    keyed.flatMapGroupsWithState[S, O](mode, GroupStateTimeout.NoTimeout()) {
      (k: Long, rows: Iterator[(Boolean, E)], state: GroupState[S]) =>
        val rs = rows.toSeq
        if (rs.exists(_._1)) { // the forget wins the batch
          if (state.exists) state.remove()
          Iterator.empty
        } else inner(k, rs.iterator.map(_._2), state)
    }

  // ---- SAX sliding-window leg ---------------------------------------------

  import SaxStreaming.{SaxState, SeriesEvent, WordOut}

  /** [[SaxStreaming.encodeStream]] with an in-band forgetting channel:
    * same ring/moments algebra, same arrival-order contract, plus the
    * one-rule erasure semantics above. */
  def saxEncodeForgetting(events: Dataset[SeriesEvent],
                          forgets: Dataset[Forget],
                          n: Int, w: Int, c: Int): Dataset[WordOut] = {
    val ss = events.sparkSession; import ss.implicits._
    val signals = events.map(e => (false, e))
      .union(forgets.map(f =>
        (true, SeriesEvent(f.userId, Long.MinValue, Long.MinValue, 0.0))))
    forgetting[SeriesEvent, SaxState, WordOut](
      signals.groupByKey(_._2.userId), OutputMode.Append(),
      SaxStreaming.encodeUpdate(n, w, c))
  }

  // ---- sessions leg --------------------------------------------------------

  import StreamingSessions.{SessionOut, SessionState, SpanEvent}

  /** [[StreamingSessions.sessionStream]] with the same in-band forgetting
    * channel: the open session (the ONLY retained state) is dropped, so
    * the cohort's in-flight span is never emitted again — the live
    * sessionizer's GDPR contract. */
  def sessionStreamForgetting(events: Dataset[SpanEvent],
                              forgets: Dataset[Forget],
                              gapUs: Long): Dataset[SessionOut] = {
    val ss = events.sparkSession; import ss.implicits._
    val signals = events.map(e => (false, e))
      .union(forgets.map(f =>
        (true, SpanEvent(f.userId, Long.MinValue, Long.MinValue))))
    forgetting[SpanEvent, SessionState, SessionOut](
      signals.groupByKey(_._2.userId), OutputMode.Update(),
      StreamingSessions.sessionUpdate(gapUs))
  }

  // ---- funnel leg ----------------------------------------------------------

  import StreamingFunnel.{FunnelEvent, FunnelOut, FunnelState}

  /** [[StreamingFunnel.funnelStream]] with the same in-band forgetting
    * channel (order-independent min semantics untouched). */
  def funnelStreamForgetting(events: Dataset[FunnelEvent],
                             forgets: Dataset[Forget]): Dataset[FunnelOut] = {
    val ss = events.sparkSession; import ss.implicits._
    val signals = events.map(e => (false, e))
      .union(forgets.map(f => (true, FunnelEvent(f.userId, Long.MinValue, ""))))
    forgetting[FunnelEvent, FunnelState, FunnelOut](
      signals.groupByKey(_._2.userId), OutputMode.Update(),
      StreamingFunnel.funnelUpdate)
  }
}
