package graft

import graft.streaming.{SaxStreaming, StreamingStateErasure}
import graft.streaming.SaxStreaming.SeriesEvent
import graft.streaming.StreamingDebounce.DebEvent
import graft.streaming.StreamingDedup.DocEvent
import graft.streaming.StreamingEwma.EwmaEvent
import graft.streaming.StreamingFunnel.FunnelEvent
import graft.streaming.StreamingStateErasure.{Forget, ForgetDoc}
import graft.streaming.StreamingSurvival.SurvEvent
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The live-state forgetting proofs (the r17 verdict's #4, the
  * StreamingErasureSpec discipline applied to GroupState instead of
  * files): erasure requests flow in-band through
  * [[StreamingStateErasure]] and must
  *
  *  - REMOVE the cohort's per-key state — proven two ways: the
  *    checkpoint state store read back via the state data source
  *    contains no cohort key, and (behaviorally) a post-erasure event
  *    for an erased key starts a FRESH window rather than continuing the
  *    old ring;
  *  - leave the post-erasure output BIT-EQUAL to a stream that never saw
  *    the cohort (per-key independence made checkable);
  *  - survive kill/restart: the removal is committed with its batch, so
  *    a new query instance restored from the checkpoint still has no
  *    cohort state (the StreamingRestartSpec harness);
  *  - no-op on duplicate forgets (at-least-once request delivery).
  */
class StreamingStateErasureSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var base: String = _

  override def beforeAll(): Unit = {
    spark = graft.SparkUtil.configure(
      SparkSession.builder().master("local[4]"), "4").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    base = java.nio.file.Files.createTempDirectory("graft-state-erase-").toString
  }

  override def afterAll(): Unit = {
    if (spark != null) spark.stop()
    if (base != null) graft.queries.AtRestTables.deleteRecursively(base)
  }

  private val (n, w, c) = (8, 4, 4)
  private val Cohort = Set(1L, 3L)

  /** Deterministic multi-user series; ts strictly increasing so arrival
    * order == (ts, eventId) order across chunks. */
  private def series(ids: Range): Seq[SeriesEvent] = {
    val rng = new scala.util.Random(7)
    val noise = (1 to 200).map(_ => rng.nextDouble())
    ids.map(i => SeriesEvent(i % 5, i.toLong, i * 1000L,
      math.sin(i.toDouble) * 10 + noise(i % 200)))
  }

  /** One fresh query instance of the forgetting SAX encode over the two
    * file sources under `tag`, resuming from the shared checkpoint. */
  private def startSax(tag: String) = {
    val ss = spark; import ss.implicits._
    // both source dirs must exist before the first instance starts (a
    // forget channel with no requests yet is the normal initial state)
    new java.io.File(s"$base/$tag/in").mkdirs()
    new java.io.File(s"$base/$tag/fg").mkdirs()
    val ev = spark.readStream
      .schema("userId LONG, eventId LONG, ts LONG, value DOUBLE")
      .parquet(s"$base/$tag/in").as[SeriesEvent]
    val fg = spark.readStream.schema("userId LONG")
      .parquet(s"$base/$tag/fg").as[Forget]
    StreamingStateErasure.saxEncodeForgetting(ev, fg, n, w, c)
      .writeStream.format("parquet")
      .option("path", s"$base/$tag/out")
      .option("checkpointLocation", s"$base/$tag/cp")
      .outputMode("append").start()
  }

  private def writeChunk(tag: String, sub: String, rows: Seq[Product]): Unit = {
    val ss = spark; import ss.implicits._
    rows match {
      case es if es.headOption.exists(_.isInstanceOf[SeriesEvent]) =>
        es.map(_.asInstanceOf[SeriesEvent]).toDF()
          .repartition(1).write.mode("append").parquet(s"$base/$tag/$sub")
      case fs =>
        fs.map(_.asInstanceOf[Forget]).toDF()
          .repartition(1).write.mode("append").parquet(s"$base/$tag/$sub")
    }
  }

  private def drain(tag: String): Unit = {
    val q = startSax(tag); q.processAllAvailable(); q.stop()
  }

  private def outRows(tag: String): Map[Long, Seq[(Long, String)]] =
    spark.read.parquet(s"$base/$tag/out")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .groupBy(_._1).map { case (u, rs) =>
        u -> rs.map(t => (t._2, t._3)).sortBy(_._1).toSeq
      }

  /** Keys currently present in a query's flatMapGroupsWithState state
    * store, via the state data source. */
  private def stateKeys(tag: String): Set[Long] =
    spark.read.format("statestore").load(s"$base/$tag/cp")
      .select("key.*").collect().map(_.getLong(0)).toSet

  test("SAX: forget removes state across restart; post-erasure output equals a never-saw-the-cohort run") {
    val all = series(1 to 60)
    val (chunk1, chunk2) = (all.take(30), all.drop(30))
    val gate2 = chunk2.filterNot(e => Cohort(e.userId)) // the erasureGate leg

    // run A: everyone, then forget the cohort, then gated traffic —
    // each phase drained by a FRESH query instance (restart between the
    // forget batch and its successor is exactly the kill window)
    writeChunk("a", "in", chunk1); drain("a")
    writeChunk("a", "fg", Cohort.toSeq.sorted.map(Forget.apply)); drain("a")
    writeChunk("a", "in", gate2); drain("a")

    // run B: never saw the cohort at all
    writeChunk("b", "in", chunk1.filterNot(e => Cohort(e.userId))); drain("b")
    writeChunk("b", "in", gate2); drain("b")

    val a = outRows("a"); val b = outRows("b")
    // post-erasure equality: every non-cohort key's FULL output history
    // is bit-equal (per-key independence, made checkable)
    for (u <- b.keySet) assert(a(u) == b(u), s"user $u diverged")
    // the cohort's pre-erasure history exists in A (erasure forgets
    // state, not already-served output) and nothing after the forget
    val cohortEvents = a.filterKeys(Cohort).values.flatten.map(_._1).toSet
    assert(cohortEvents.nonEmpty &&
      cohortEvents.forall(id => chunk1.exists(_.eventId == id)),
      "cohort output after the forget batch")

    // the state store holds NO cohort key — and every remaining key
    assert(stateKeys("a").intersect(Cohort).isEmpty,
      "cohort keys still present in the checkpoint state store")
    assert(b.keySet.subsetOf(stateKeys("a")),
      "non-cohort keys must survive the forget")

    // duplicate forget: a no-op (state already absent), nothing breaks
    writeChunk("a", "fg", Seq(Forget(1L))); drain("a")
    assert(outRows("a") == a, "a duplicate forget changed the output")
    assert(stateKeys("a").intersect(Cohort).isEmpty)
  }

  test("SAX: an ungated post-erasure event starts a FRESH window (behavioral proof of removal)") {
    val all = series(1 to 40).filter(_.userId == 1L) // one cohort user
    writeChunk("c", "in", all.take(4)); drain("c")
    writeChunk("c", "fg", Seq(Forget(1L))); drain("c")
    // an event that slips past the gate re-enters as a brand-new key:
    // its word must equal a fresh window's first append (NaN-prefilled
    // ring), not the continuation of the pre-erasure ring
    val probe = all(4)
    writeChunk("c", "in", Seq(probe)); drain("c")
    val fresh = new graft.sax.SaxWindow(n, w, c).append(probe.value)
    val continued = {
      val win = new graft.sax.SaxWindow(n, w, c)
      all.take(4).foreach(e => win.append(e.value))
      win.append(probe.value)
    }
    assert(fresh != continued, "fixture too weak: fresh == continued word")
    val got = outRows("c")(1L).toMap.apply(probe.eventId)
    assert(got == fresh,
      s"post-erasure event continued the old ring: got $got, want $fresh")
  }

  test("sessions: forget drops the open span; survivors equal never-saw-the-cohort") {
    val ss = spark; import ss.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StreamingSessions.SpanEvent
    val gap = 100L
    val pre = Seq(SpanEvent(1L, 10L, 1L), SpanEvent(2L, 10L, 2L),
      SpanEvent(1L, 50L, 3L), SpanEvent(2L, 60L, 4L), SpanEvent(3L, 5L, 5L))
    val post = Seq(SpanEvent(2L, 120L, 6L), SpanEvent(4L, 7L, 7L))

    def run(tag: String, preEv: Seq[SpanEvent], forget: Boolean) = {
      val ev = MemoryStream[SpanEvent](spark)
      val fg = MemoryStream[Forget](spark)
      val q = StreamingStateErasure
        .sessionStreamForgetting(ev.toDS(), fg.toDS(), gap)
        .writeStream.format("memory").queryName(s"sess_$tag")
        .option("checkpointLocation", s"$base/sess_$tag/cp")
        .outputMode("update").start()
      ev.addData(preEv); q.processAllAvailable()
      if (forget) { fg.addData(Cohort.toSeq.map(Forget.apply)); q.processAllAvailable() }
      ev.addData(post.filterNot(e => forget && Cohort(e.userId)))
      q.processAllAvailable(); q.stop()
      // latest row per (userId, sUs)
      spark.table(s"sess_$tag").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))
        .groupBy(t => (t._1, t._2))
        .map { case (k, rs) => k -> { val l = rs.maxBy(_._4); (l._3, l._5) } }
    }
    val a = run("a", pre, forget = true)
    val b = run("b", pre.filterNot(e => Cohort(e.userId)), forget = false)
    for (k <- b.keySet) assert(a(k) == b(k), s"session $k diverged")
    // the cohort's state is gone and its open span never re-emits
    val keys = spark.read.format("statestore").load(s"$base/sess_a/cp")
      .select("key.*").collect().map(_.getLong(0)).toSet
    assert(keys.intersect(Cohort).isEmpty,
      "cohort keys still in the session state store")
  }

  test("erasureGate drops the cohort's records in a live stream-static anti join") {
    val ss = spark; import ss.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val src = MemoryStream[(Long, Double)](spark)
    val erased = Cohort.toSeq.toDF("user_id")
    val gated = StreamingStateErasure.erasureGate(
      src.toDF().toDF("user_id", "value"), erased)
    val q = gated.writeStream.format("memory").queryName("gate_t")
      .outputMode("append").start()
    src.addData(Seq((1L, 0.5), (2L, 1.5), (3L, 2.5), (4L, 3.5)))
    q.processAllAvailable(); q.stop()
    val users = spark.table("gate_t").collect().map(_.getLong(0)).toSet
    assert(users == Set(2L, 4L), s"gate let through: $users")
  }

  test("funnel: forget removes the firsts; replay through shuffled batches equals never-saw-the-cohort") {
    val ss = spark; import ss.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val events = Seq(
      FunnelEvent(1L, 10L, "view"), FunnelEvent(1L, 20L, "click"),
      FunnelEvent(2L, 10L, "view"), FunnelEvent(2L, 30L, "click"),
      FunnelEvent(3L, 5L, "view"),
      FunnelEvent(2L, 50L, "purchase"), FunnelEvent(4L, 9L, "view"))
    val post = Seq(FunnelEvent(2L, 40L, "click"), FunnelEvent(4L, 12L, "click"))

    def run(tag: String, pre: Seq[FunnelEvent], forget: Boolean): Map[Long, (Option[Long], Option[Long], Option[Long])] = {
      val ev = MemoryStream[FunnelEvent](spark)
      val fg = MemoryStream[Forget](spark)
      val q = StreamingStateErasure.funnelStreamForgetting(ev.toDS(), fg.toDS())
        .writeStream.format("memory").queryName(s"fun_$tag")
        .option("checkpointLocation", s"$base/fun_$tag/cp")
        .outputMode("update").start()
      pre.grouped(3).foreach { g => ev.addData(g); q.processAllAvailable() }
      if (forget) {
        fg.addData(Cohort.toSeq.map(Forget.apply)); q.processAllAvailable()
        // duplicate forgets, interleaved with live traffic
        fg.addData(Seq(Forget(3L))); q.processAllAvailable()
      }
      ev.addData(post.filterNot(e => forget && Cohort(e.userId)))
      q.processAllAvailable(); q.stop()
      val rows = spark.table(s"fun_$tag").collect()
        .map(r => (r.getLong(0), r.getLong(1),
          Option(r.get(2)).map(_.asInstanceOf[Long]),
          Option(r.get(3)).map(_.asInstanceOf[Long]),
          Option(r.get(4)).map(_.asInstanceOf[Long])))
      rows.groupBy(_._1).map { case (u, rs) =>
        val latest = rs.maxBy(_._2); u -> (latest._3, latest._4, latest._5)
      }
    }

    val a = run("a", events, forget = true)
    val b = run("b", events.filterNot(e => Cohort(e.userId)), forget = false)
    for (u <- b.keySet)
      assert(a(u) == b(u), s"user $u diverged under forgetting")
    // the cohort's LATEST row predates the forget; no row after it
    assert(a.keySet.intersect(Cohort).forall(u =>
      a(u) == (Some(events.filter(_.userId == u).map(_.ts).min), None, None)
        || Cohort(u)), "unexpected cohort row shape")
    val keys = spark.read.format("statestore").load(s"$base/fun_a/cp")
      .select("key.*").collect().map(_.getLong(0)).toSet
    assert(keys.intersect(Cohort).isEmpty,
      "cohort keys still in the funnel state store")
  }

  /** The shared A/B harness for the three Long-keyed Append-mode legs
    * (survival/debounce/ewma): run A sees everyone, forgets the cohort,
    * then gated traffic; run B never saw the cohort. Asserts every
    * non-cohort row set equal, no cohort row after the forget batch, and
    * no cohort key left in the state store. */
  private def appendLegProof[E <: Product : org.apache.spark.sql.Encoder, O](
      tag: String,
      pre: Seq[E], post: Seq[E], userOf: E => Long,
      stream: (org.apache.spark.sql.Dataset[E],
               org.apache.spark.sql.Dataset[Forget]) => org.apache.spark.sql.Dataset[O],
      rowUser: org.apache.spark.sql.Row => Long): Unit = {
    val ss = spark; import ss.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

    def run(sub: String, preEv: Seq[E], forget: Boolean): Map[Long, Set[String]] = {
      val ev = MemoryStream[E](spark)
      val fg = MemoryStream[Forget](spark)
      val q = stream(ev.toDS(), fg.toDS())
        .toDF().writeStream.format("memory").queryName(s"${tag}_$sub")
        .option("checkpointLocation", s"$base/${tag}_$sub/cp")
        .outputMode("append").start()
      ev.addData(preEv); q.processAllAvailable()
      if (forget) {
        fg.addData(Cohort.toSeq.sorted.map(Forget.apply)); q.processAllAvailable()
        fg.addData(Seq(Forget(Cohort.min))); q.processAllAvailable() // duplicate
      }
      // post traffic is gated in BOTH runs (the erasureGate leg); run B
      // additionally never saw the cohort's pre history
      ev.addData(post.filterNot(e => Cohort(userOf(e))))
      q.processAllAvailable(); q.stop()
      spark.table(s"${tag}_$sub").collect()
        .groupBy(rowUser).map { case (u, rs) => u -> rs.map(_.toString).toSet }
    }

    val a = run("a", pre, forget = true)
    val b = run("b", pre.filterNot(e => Cohort(userOf(e))), forget = false)
    assert(b.nonEmpty, s"$tag fixture: no survivor output")
    for (u <- b.keySet) assert(a(u) == b(u), s"$tag: user $u diverged")
    // the fixture must actually exercise the gate (cohort post traffic exists)
    assert(post.exists(e => Cohort(userOf(e))),
      s"$tag fixture: no gated cohort traffic")
    val keys = spark.read.format("statestore").load(s"$base/${tag}_a/cp")
      .select("key.*").collect().map(_.getLong(0)).toSet
    assert(keys.intersect(Cohort).isEmpty,
      s"$tag: cohort keys still in the state store")
    assert(b.keySet.subsetOf(keys), s"$tag: non-cohort keys must survive")
  }

  test("survival: forget drops the open interval; survivors equal never-saw-the-cohort") {
    val ss = spark; import ss.implicits._
    val pre = Seq(
      SurvEvent(1L, 1000000L, 1L), SurvEvent(2L, 1000000L, 2L),
      SurvEvent(1L, 4000000L, 3L), SurvEvent(2L, 9000000L, 4L),
      SurvEvent(3L, 2000000L, 5L), SurvEvent(4L, 1000000L, 6L))
    val post = Seq(
      SurvEvent(2L, 15000000L, 7L), SurvEvent(4L, 8000000L, 8L),
      SurvEvent(1L, 20000000L, 9L), SurvEvent(3L, 30000000L, 10L))
    appendLegProof[SurvEvent, graft.streaming.StreamingSurvival.SurvOut](
      "surv", pre, post, _.userId,
      StreamingStateErasure.survivalStreamForgetting, _.getLong(0))
  }

  test("debounce: forget drops the last-event timestamp; survivors equal never-saw-the-cohort") {
    val ss = spark; import ss.implicits._
    val tau = graft.queries.RelQueries.DebounceUs
    val pre = Seq(
      DebEvent(1L, 1L, 0L, "view", 1.0), DebEvent(2L, 2L, 0L, "view", 2.0),
      DebEvent(1L, 3L, tau / 2, "click", 3.0), DebEvent(2L, 4L, tau * 2, "click", 4.0),
      DebEvent(3L, 5L, 10L, "view", 5.0), DebEvent(4L, 6L, 10L, "view", 6.0))
    val post = Seq(
      DebEvent(2L, 7L, tau * 2 + tau / 4, "purchase", 7.0),
      DebEvent(4L, 8L, tau * 3, "click", 8.0),
      DebEvent(1L, 9L, tau * 5, "view", 9.0), DebEvent(3L, 10L, tau * 5, "view", 10.0))
    appendLegProof[DebEvent, graft.streaming.StreamingDebounce.DebOut](
      "deb", pre, post, _.userId,
      StreamingStateErasure.debounceStreamForgetting, _.getLong(0))
  }

  test("ewma: forget drops the recent-values ring; survivors equal never-saw-the-cohort") {
    val ss = spark; import ss.implicits._
    val pre = (1 to 12).map(i =>
      EwmaEvent(i % 5, i.toLong, i * 1000L, "view", math.sin(i.toDouble) + 2.0))
    val post = (13 to 20).map(i =>
      EwmaEvent(i % 5, i.toLong, i * 1000L, "view", math.cos(i.toDouble) + 2.0))
    appendLegProof[EwmaEvent, graft.streaming.StreamingEwma.EwmaOut](
      "ewma", pre, post, _.userId,
      StreamingStateErasure.ewmaStreamForgetting, _.getLong(0))
  }

  test("composed wiring: erasureGate feeds a forgetting leg in ONE live query") {
    val ss = spark; import ss.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val tau = graft.queries.RelQueries.DebounceUs
    val ev = MemoryStream[DebEvent](spark)
    val fg = MemoryStream[Forget](spark)
    val erased = Cohort.toSeq.toDF("user_id")
    // the production shape: the at-rest store gates the door AND the
    // in-band channel clears pre-existing state, in one streaming plan
    val gated = StreamingStateErasure
      .erasureGate(ev.toDF(), erased, keyCol = "userId").as[DebEvent]
    val q = StreamingStateErasure.debounceStreamForgetting(gated, fg.toDS())
      .writeStream.format("memory").queryName("gateleg_t")
      .option("checkpointLocation", s"$base/gateleg_t/cp")
      .outputMode("append").start()
    // cohort traffic in the SAME batches as survivor traffic: the gate
    // must drop it before the stateful operator ever keys on it
    ev.addData(Seq(DebEvent(1L, 1L, 0L, "view", 1.0),
      DebEvent(2L, 2L, 0L, "view", 2.0), DebEvent(4L, 3L, 0L, "view", 3.0)))
    q.processAllAvailable()
    fg.addData(Cohort.toSeq.map(Forget.apply)); q.processAllAvailable()
    ev.addData(Seq(DebEvent(1L, 4L, tau, "click", 4.0),
      DebEvent(2L, 5L, tau / 2, "click", 5.0), DebEvent(4L, 6L, tau * 2, "click", 6.0)))
    q.processAllAvailable(); q.stop()
    val byUser = spark.table("gateleg_t").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.length).toMap
    assert(byUser.keySet == Set(2L, 4L), s"gate leaked: $byUser")
    assert(byUser(2L) == 2 && byUser(4L) == 2)
    val keys = spark.read.format("statestore").load(s"$base/gateleg_t/cp")
      .select("key.*").collect().map(_.getLong(0)).toSet
    assert(keys == Set(2L, 4L), s"state keys: $keys")
  }

  test("first-seen dedup: forgetting a content hash deposes the erased canonical; later content elects a fresh survivor") {
    val ss = spark; import ss.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val tsOf = (i: Long) => new java.sql.Timestamp(i)
    val erasedText = "The Quick  Brown Fox!" // normalizes with case/space/punct folding
    val otherText = "an entirely different document body"
    val pre = Seq(DocEvent(5L, tsOf(1), erasedText),
      DocEvent(7L, tsOf(2), "the quick brown fox"), // same normalized content -> canonical 5
      DocEvent(9L, tsOf(3), otherText))
    val post = Seq(DocEvent(11L, tsOf(4), "THE QUICK BROWN FOX."),
      DocEvent(12L, tsOf(5), otherText))
    val targetHash = StreamingStateErasure.docHash(erasedText)
    assert(targetHash == StreamingStateErasure.docHash("the quick brown fox"))

    def run(tag: String, preDocs: Seq[DocEvent], forget: Boolean): Map[Long, (Long, Boolean)] = {
      val ev = MemoryStream[DocEvent](spark)
      val fg = MemoryStream[ForgetDoc](spark)
      val q = StreamingStateErasure.firstSeenForgetting(ev.toDS(), fg.toDS())
        .writeStream.format("memory").queryName(s"fsd_$tag")
        .option("checkpointLocation", s"$base/fsd_$tag/cp")
        .outputMode("append").start()
      ev.addData(preDocs); q.processAllAvailable()
      if (forget) {
        fg.addData(Seq(ForgetDoc(targetHash))); q.processAllAvailable()
        fg.addData(Seq(ForgetDoc(targetHash))); q.processAllAvailable() // duplicate
      }
      ev.addData(post); q.processAllAvailable(); q.stop()
      spark.table(s"fsd_$tag").collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    }

    val a = run("a", pre, forget = true)
    // run B never saw the erased content at all (docs 5 and 7 gated)
    val b = run("b", pre.filterNot(d =>
      StreamingStateErasure.docHash(d.text) == targetHash), forget = false)

    // post-erasure: doc 11 is a FRESH survivor in both runs — the erased
    // canonical id 5 is never resurrected
    assert(a(11L) == ((11L, false)), s"doc 11 in A: ${a(11L)}")
    assert(b(11L) == ((11L, false)), s"doc 11 in B: ${b(11L)}")
    // untouched content is unaffected: doc 12 still dups onto 9
    assert(a(12L) == ((9L, true)) && b(12L) == ((9L, true)))
    // pre-erasure history exists in A (forgetting state, not served output)
    assert(a(5L) == ((5L, false)) && a(7L) == ((5L, true)))
    // the state store: the target hash's entry must not map to the erased
    // canonical anymore (doc 11 re-created it with canonical 11)
    def longsOf(v: Any): Seq[Long] = v match {
      case l: Long => Seq(l)
      case r: org.apache.spark.sql.Row => r.toSeq.flatMap(longsOf)
      case _ => Seq.empty
    }
    val vals = spark.read.format("statestore").load(s"$base/fsd_a/cp")
      .select("value").collect().flatMap(longsOf).toSet
    assert(vals.contains(11L), "fresh canonical id missing from state values")
    assert(!vals.contains(5L), "erased canonical id still present in state values")
  }
}
