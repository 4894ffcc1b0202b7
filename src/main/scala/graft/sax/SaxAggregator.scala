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
    // entries stays sorted: binary-insert the new triple (O(n) copy)
    // instead of re-sorting the whole buffer per input row
    val entry = (e.ts, e.eventId, e.value)
    val es = b.entries
    var lo = 0
    var hi = es.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      val m = es(mid)
      if (m._1 < entry._1 || (m._1 == entry._1 && m._2 <= entry._2)) lo = mid + 1
      else hi = mid
    }
    if (es.length == n && lo == 0) return b // older than everything we keep
    val out = new Array[(Long, Long, Double)](es.length + 1)
    System.arraycopy(es, 0, out, 0, lo)
    out(lo) = entry
    System.arraycopy(es, lo, out, lo + 1, es.length - lo)
    Buf(if (out.length > n) out.drop(out.length - n) else out)
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
