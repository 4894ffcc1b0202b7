package graft.streaming

import graft.sax.SaxWindow
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming port of the reference's stateful sliding-window
  * operator (`sts_window`, SURVEY.md §2 ops 7-10): per-key state holds the
  * NaN-prefilled ring plus the O(1) online moments, exactly the 3-case
  * update algebra of append_value (/root/reference/src/symtseries.c:434-479).
  *
  * The GroupState snapshot/restore round-trip is the Spark analogue of the
  * reference's lua_sandbox serialize_sax checkpoint
  * (/root/reference/lua/lua_sax.c:293-342): Spark persists [[SaxState]] to
  * the checkpoint state store between micro-batches.
  *
  * Semantics: strictly arrival-ordered like the reference (no watermark /
  * late-data reordering). Within a micro-batch, events are ordered by
  * (ts, eventId); across batches, ordering is arrival order — matching the
  * reference's append semantics rather than event-time semantics. At 100 TB
  * scale the state is O(n) doubles per key and the only shuffle is the
  * groupByKey on the series key.
  */
object SaxStreaming {

  final case class SeriesEvent(userId: Long, eventId: Long, ts: Long, value: Double)
  final case class WordOut(userId: Long, eventId: Long, word: String)

  /** Normalize an events frame (user_id, event_id, ts, value) into the typed
    * [[SeriesEvent]] surface. `ts` becomes epoch NANOSECONDS whatever the
    * carrier type — TIMESTAMP/TIMESTAMP_NTZ (µs·1000, lossless for µs
    * parquet) or legacy integer ns (µs-truncated, the same precision every
    * batch ordering uses). One conversion point so a schema change in the
    * source can never split the typed streaming surface from the batch one. */
  def seriesEvents(events: org.apache.spark.sql.DataFrame): Dataset[SeriesEvent] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.functions._
    events.select(col("user_id").as("userId"), col("event_id").as("eventId"),
        (graft.queries.QueryBase.tsUs(events) * lit(1000L)).as("ts"), col("value"))
      .as[SeriesEvent]
  }

  /** Serializable window state (ring contents in insertion order + moments). */
  final case class SaxState(values: Array[Double], mu: Double, s2: Double,
                            finiteCnt: Long)

  /** Per-event sliding-window SAX encode over a (possibly streaming)
    * Dataset, emitting the updated word after every append — the streaming
    * equivalent of the batch q02 window query. */
  def encodeStream(events: Dataset[SeriesEvent], n: Int, w: Int, c: Int)
  : Dataset[WordOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.userId)
      .flatMapGroupsWithState[SaxState, WordOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout())(encodeUpdate(n, w, c))
  }

  /** The per-key update body, exposed so
    * [[StreamingStateErasure.saxEncodeForgetting]] wraps the IDENTICAL
    * algebra (one definition — the forgetting twin cannot drift). */
  private[streaming] def encodeUpdate(n: Int, w: Int, c: Int)
      : (Long, Iterator[SeriesEvent], GroupState[SaxState]) => Iterator[WordOut] =
    (userId: Long, rows: Iterator[SeriesEvent], state: GroupState[SaxState]) => {
      val win = state.getOption match {
        case Some(s) => restore(s, n, w, c)
        case None    => new SaxWindow(n, w, c)
      }
      val out = rows.toSeq.sortBy(e => (e.ts, e.eventId)).map { e =>
        WordOut(userId, e.eventId, win.append(e.value))
      }
      state.update(snapshot(win))
      out.iterator
    }

  /** Streaming numerosity reduction: running count per SAX word
    * (Update-mode aggregation downstream of the stateful encode). */
  def wordCounts(events: Dataset[SeriesEvent], n: Int, w: Int, c: Int) = {
    encodeStream(events, n, w, c).groupBy("word").count()
  }

  /** Event-time extension the reference lacks (it is strictly
    * arrival-ordered): watermarked tumbling-window word production. Each
    * (key, event-time window) group batch-encodes the values that arrived
    * for that window, tolerating `lateness` of out-of-order data — the
    * idiomatic Structured Streaming treatment when event time, not arrival
    * order, defines the series. */
  /** Shared by the tumbling and session event-time variants: event-time
    * groups have data-dependent sizes, so truncate to the largest
    * encodable prefix (n % w == 0); null (filtered) below w values. ONE
    * definition so the two variants' truncation/null contracts cannot
    * drift. */
  private def truncEncode(w: Int, c: Int) =
    org.apache.spark.sql.functions.udf((vs: Seq[Double]) => {
      val n = vs.length - vs.length % w
      if (n == 0) null else graft.sax.Sax.encode(vs.take(n).toArray, w, c)
    })

  def eventTimeWords(events: Dataset[SeriesEvent], windowLength: String,
                     lateness: String, w: Int, c: Int) = {
    import org.apache.spark.sql.functions._
    val enc = truncEncode(w, c)
    events
      // tsUs dispatches on the carrier type; for SeriesEvent's ns Long it is
      // integer division (FP division of ns epochs loses precision above 2^53)
      .withColumn("ets", timestamp_micros(graft.queries.QueryBase.tsUs(events.toDF())))
      .withWatermark("ets", lateness)
      .groupBy(window(col("ets"), windowLength), col("userId"))
      .agg(sort_array(collect_list(struct(col("ts"), col("eventId"), col("value")))).as("rows"))
      .select(col("window"), col("userId"),
        enc(expr("transform(rows, r -> r.value)")).as("word"))
      .where(col("word").isNotNull) // windows with fewer than w values don't encode
  }

  /** Event-time SESSION windows (gap-closed) — the streaming analogue of
    * the batch q27 sessionization: a session collects a key's events until
    * `gap` of event-time silence, then (once the watermark passes its
    * close) batch-encodes the session's values into one word. Built on
    * Spark's `session_window` state merging, so state per key is one open
    * session row, bounded by the watermark horizon like [[eventTimeWords]].
    * At 100 TB the only shuffle is the session-window aggregation on the
    * series key — the same partitioning every other per-key op uses. */
  def sessionWords(events: Dataset[SeriesEvent], gap: String,
                   lateness: String, w: Int, c: Int) = {
    import org.apache.spark.sql.functions._
    val enc = truncEncode(w, c)
    events
      .withColumn("ets", timestamp_micros(graft.queries.QueryBase.tsUs(events.toDF())))
      .withWatermark("ets", lateness)
      .groupBy(session_window(col("ets"), gap), col("userId"))
      .agg(sort_array(collect_list(struct(col("ts"), col("eventId"), col("value")))).as("rows"))
      .select(col("session_window"), col("userId"), size(col("rows")).as("n_events"),
        enc(expr("transform(rows, r -> r.value)")).as("word"))
      .where(col("word").isNotNull)
  }

  def snapshot(win: SaxWindow): SaxState =
    SaxState(win.values, win.currentMu, win.currentS2, win.currentFiniteCnt)

  def restore(s: SaxState, n: Int, w: Int, c: Int): SaxWindow =
    SaxWindow.restore(n, w, c, s.values, s.mu, s.s2, s.finiteCnt)
}
