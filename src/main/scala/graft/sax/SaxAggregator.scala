package graft.sax

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Incremental "encode the trailing window of a grouped series" as a typed
  * Aggregator: state is a BOUNDED buffer of the n latest (ts, eventId,
  * value) triples, merged associatively — the aggregation analogue of
  * `sts_append_array`'s keep-only-last-n semantics
  * (/root/reference/src/symtseries.c:494-513).
  *
  * Unlike collect_list + sort + encode, the state never exceeds n entries
  * per group, so a group with millions of rows aggregates with map-side
  * partial combine and O(n) shuffle bytes per key — the shape that
  * matters at 100 TB.
  *
  * Input ordering: (ts, eventId) ascending; fewer than n values encode
  * with NaN left-padding (ring prefill), matching the window operator.
  */
class SaxWindowAggregator(n: Int, w: Int, c: Int)
  extends Aggregator[SaxWindowAggregator.In, SaxWindowAggregator.Buf, String] {

  import SaxWindowAggregator._

  override def zero: Buf = Buf(Array.empty)

  override def reduce(b: Buf, e: In): Buf = {
    val merged = (b.entries :+ ((e.ts, e.eventId, e.value)))
      .sortBy(t => (t._1, t._2))
    Buf(merged.takeRight(n))
  }

  override def merge(a: Buf, b: Buf): Buf = {
    val merged = (a.entries ++ b.entries).sortBy(t => (t._1, t._2))
    Buf(merged.takeRight(n))
  }

  override def finish(b: Buf): String =
    Sax.encodePadded(b.entries.map(_._3), n, w, c)

  override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
  override def outputEncoder: Encoder[String] = Encoders.STRING
}

object SaxWindowAggregator {
  final case class In(ts: Long, eventId: Long, value: Double)
  final case class Keyed(userId: Long, ts: Long, eventId: Long, value: Double)
  final case class Buf(entries: Array[(Long, Long, Double)])
}
