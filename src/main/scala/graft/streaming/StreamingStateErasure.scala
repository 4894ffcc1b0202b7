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
  *    (StreamingStateErasureSpec proves it for every leg, across
  *    kill/restart on the SAX leg), because per-key state is independent
  *    and the erased keys contribute neither state nor rows;
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
  *
  * Coverage (the r17 verdict's enumeration): every user-keyed stateful
  * module has a leg here — [[SaxStreaming]] (ring+moments),
  * [[StreamingSessions]] (open span), [[StreamingFunnel]] (firsts),
  * [[StreamingSurvival]] (last timestamp), [[StreamingDebounce]] (last
  * timestamp), [[StreamingEwma]] (recent-values ring) — plus
  * [[StreamingDedup.firstSeenStream]], which is keyed by CONTENT hash
  * rather than user: its retained canonical-survivor pointer IS an
  * erased document's id, so forgetting there drops the hash's state and
  * later identical content elects a fresh survivor.
  *
  * Named exemptions (the q311 exemption idiom, so the census is total):
  * [[StreamingDrift]] and [[StreamingAcf]] are keyed by EVENT TYPE and
  * their state holds only cross-user aggregate moments of daily means —
  * no cohort key and no per-user value exists in the state store, so
  * key-removal forgetting does not apply. User-level erasure for an
  * aggregate is the decrement/rebuild story, which those signals get
  * from the batch side: the day-mean feed is derived from the events
  * table, whose erasure runs through the at-rest remediation (q315's
  * recluster/rewrite legs) — a re-fed monitor then never sees the
  * cohort. The same reasoning exempts [[SketchStreaming]] (HLL
  * registers are not subtractable; the rebuild-from-retained policy is
  * executed at rest by q315) and [[StreamingEnrich]] /
  * [[StreamingRangeJoin]] / [[SlidingStreaming]] / [[MvMaintenance]]'s
  * additive partials (stateless per-user, or integer partials with the
  * [[StreamingMvErasure]] decrement twin already proven).
  */
object StreamingStateErasure {

  /** An erasure request for a user-keyed stream. */
  final case class Forget(userId: Long)

  /** An erasure request for the content-keyed first-seen annotator: the
    * normalized-content hash of the erased document (derive it with
    * [[docHash]] when the request carries raw text). */
  final case class ForgetDoc(hash: String)

  /** The q30/q56 normalized-content md5 an erasure request needs to
    * address first-seen state — ONE definition, shared with the stream's
    * own group key ([[StreamingDedup.normHash]]). */
  def docHash(text: String): String = StreamingDedup.normHash(text)

  /** How a stateful streaming module forgets. */
  sealed trait StateCoverage
  /** `leg` = the forgetting entry point here; `body` = the module's
    * extracted update function the leg must compose (qualified name, so
    * the census spec can verify the leg wraps the REAL state algebra,
    * not a copy). */
  final case class ForgettingLeg(leg: String, body: String) extends StateCoverage
  /** No per-user data exists in the module's state; the stated reason
    * names where that user's erasure actually happens. */
  final case class ExemptState(reason: String) extends StateCoverage

  /** The live-state forgetting census — the q311/EstateCoverage idiom
    * for GroupState: every module in `graft.streaming` that retains
    * cross-batch state (flatMapGroupsWithState / dropDuplicates*) is
    * either wired to a forgetting leg here or exempt with a reason.
    * StateErasureCoverageSpec scans the sources and reddens the suite if
    * a new stateful module lands unclassified.
    *
    * [[StreamingDedup]]'s second stateful operator (`exactDedupStream`)
    * needs no leg of its own: `dropDuplicatesWithinWatermark` state
    * self-expires at the lateness horizon — the q316 bounded-retention
    * contract — so an erased document's hash leaves the store with the
    * watermark, and the batch-side q56 survivor pass (already erasure-
    * governed at rest) is the durable record. */
  val stateCoverage: Map[String, StateCoverage] = Map(
    "SaxStreaming" -> ForgettingLeg("saxEncodeForgetting", "SaxStreaming.encodeUpdate"),
    "StreamingSessions" -> ForgettingLeg("sessionStreamForgetting", "StreamingSessions.sessionUpdate"),
    "StreamingFunnel" -> ForgettingLeg("funnelStreamForgetting", "StreamingFunnel.funnelUpdate"),
    "StreamingSurvival" -> ForgettingLeg("survivalStreamForgetting", "StreamingSurvival.survivalUpdate"),
    "StreamingDebounce" -> ForgettingLeg("debounceStreamForgetting", "StreamingDebounce.debounceUpdate"),
    "StreamingEwma" -> ForgettingLeg("ewmaStreamForgetting", "StreamingEwma.ewmaUpdate"),
    "StreamingDedup" -> ForgettingLeg("firstSeenForgetting", "StreamingDedup.firstSeenUpdate"),
    "StreamingDrift" -> ExemptState(
      "type-keyed Page–Hinkley moments aggregate daily means across users — " +
        "no cohort key or per-user value in state; user erasure happens at " +
        "rest (q315 recluster/rewrite of the events the day-mean feed derives " +
        "from), after which a re-fed monitor never sees the cohort"),
    "StreamingAcf" -> ExemptState(
      "type-keyed correlogram ring+moments over daily means — same shape and " +
        "same at-rest erasure path as StreamingDrift"))

  /** Drop an erased cohort's records at the ingest door: the
    * stream-static anti join against the at-rest erased-user store (one
    * broadcastable id column). This is what makes "never saw the
    * cohort" hold for every batch AFTER the store landed; the in-band
    * signal handles the state that predates it. `keyCol` names the
    * stream side's key (the typed legs use `userId`), so the gate
    * composes directly upstream of a forgetting leg — a stream-static
    * join below a flatMapGroupsWithState is a supported plan, proven
    * live by the composed-wiring test in StreamingStateErasureSpec. */
  def erasureGate(events: DataFrame, erasedUsers: DataFrame,
                  keyCol: String = "user_id"): DataFrame =
    events.join(broadcast(erasedUsers.select(col("user_id"))),
      events(keyCol) === erasedUsers("user_id"), "left_anti")

  /** The forgetting wrapper around any per-key stateful update function:
    * `inner` is the module's existing (key, rows, state) body, untouched
    * — forgetting composes AROUND the business logic, so every user-keyed
    * module adopts it without re-deriving its state algebra. */
  private def forgetting[K, E, S, O: Encoder](
      keyed: KeyValueGroupedDataset[K, (Boolean, E)],
      mode: OutputMode,
      inner: (K, Iterator[E], GroupState[S]) => Iterator[O])(
      implicit stateEnc: Encoder[S]): Dataset[O] =
    keyed.flatMapGroupsWithState[S, O](mode, GroupStateTimeout.NoTimeout()) {
      (k: K, rows: Iterator[(Boolean, E)], state: GroupState[S]) =>
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
    forgetting[Long, SeriesEvent, SaxState, WordOut](
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
    forgetting[Long, SpanEvent, SessionState, SessionOut](
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
    forgetting[Long, FunnelEvent, FunnelState, FunnelOut](
      signals.groupByKey(_._2.userId), OutputMode.Update(),
      StreamingFunnel.funnelUpdate)
  }

  // ---- survival leg ---------------------------------------------------------

  import StreamingSurvival.{SurvEvent, SurvOut, SurvState}

  /** [[StreamingSurvival.survivalStream]] with the same in-band forgetting
    * channel: the user's last-event timestamp and revision are dropped, so
    * no further gap closes against the erased history and the cohort's
    * open (censored) interval is never re-emitted — the live Kaplan–Meier
    * feed's GDPR contract. */
  def survivalStreamForgetting(events: Dataset[SurvEvent],
                               forgets: Dataset[Forget]): Dataset[SurvOut] = {
    val ss = events.sparkSession; import ss.implicits._
    val signals = events.map(e => (false, e))
      .union(forgets.map(f =>
        (true, SurvEvent(f.userId, Long.MinValue, Long.MinValue))))
    forgetting[Long, SurvEvent, SurvState, SurvOut](
      signals.groupByKey(_._2.userId), OutputMode.Append(),
      StreamingSurvival.survivalUpdate)
  }

  // ---- debounce leg ---------------------------------------------------------

  import StreamingDebounce.{DebEvent, DebOut, DebState}

  /** [[StreamingDebounce.debounceStream]] with the same in-band forgetting
    * channel: the user's last-raw-event timestamp is dropped, so an
    * ungated post-erasure event is judged as a FIRST event (kept), not
    * against the erased history. */
  def debounceStreamForgetting(events: Dataset[DebEvent],
                               forgets: Dataset[Forget]): Dataset[DebOut] = {
    val ss = events.sparkSession; import ss.implicits._
    val signals = events.map(e => (false, e))
      .union(forgets.map(f =>
        (true, DebEvent(f.userId, Long.MinValue, Long.MinValue, "", 0.0))))
    forgetting[Long, DebEvent, DebState, DebOut](
      signals.groupByKey(_._2.userId), OutputMode.Append(),
      StreamingDebounce.debounceUpdate)
  }

  // ---- EWMA leg -------------------------------------------------------------

  import StreamingEwma.{EwmaEvent, EwmaOut, EwmaState}

  /** [[StreamingEwma.ewmaStream]] with the same in-band forgetting
    * channel: the user's recent-values ring is dropped, so a post-erasure
    * value smooths from scratch rather than against erased history. */
  def ewmaStreamForgetting(events: Dataset[EwmaEvent],
                           forgets: Dataset[Forget]): Dataset[EwmaOut] = {
    val ss = events.sparkSession; import ss.implicits._
    val signals = events.map(e => (false, e))
      .union(forgets.map(f =>
        (true, EwmaEvent(f.userId, Long.MinValue, Long.MinValue, "", 0.0))))
    forgetting[Long, EwmaEvent, EwmaState, EwmaOut](
      signals.groupByKey(_._2.userId), OutputMode.Append(),
      StreamingEwma.ewmaUpdate)
  }

  // ---- first-seen dedup leg (content-keyed) --------------------------------

  import StreamingDedup.{DedupOut, DocEvent}

  /** [[StreamingDedup.firstSeenStream]] with the same in-band forgetting
    * channel, keyed by the normalized-CONTENT hash instead of a user id:
    * the retained state is the canonical (first-seen) doc id for each
    * content hash, which for an erased document is precisely a retained
    * cohort key. Forgetting drops the hash's state, so later identical
    * content elects a fresh survivor; the forget signal smuggles the
    * target hash through the sentinel's `text` field (the key function
    * dispatches on the signal flag, so data rows still hash their text). */
  def firstSeenForgetting(docs: Dataset[DocEvent],
                          forgets: Dataset[ForgetDoc]): Dataset[DedupOut] = {
    val ss = docs.sparkSession; import ss.implicits._
    val signals = docs.map(d => (false, d))
      .union(forgets.map(f =>
        (true, DocEvent(Long.MinValue, new java.sql.Timestamp(0L), f.hash))))
    forgetting[String, DocEvent, Long, DedupOut](
      signals.groupByKey(t =>
        if (t._1) t._2.text else StreamingDedup.normHash(t._2.text)),
      OutputMode.Append(),
      StreamingDedup.firstSeenUpdate)
  }
}
