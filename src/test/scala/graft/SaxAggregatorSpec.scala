package graft

import graft.sax.{Sax, SaxWindowAggregator}
import graft.sax.SaxWindowAggregator.{Buf, In}
import org.scalatest.funsuite.AnyFunSuite

/** The aggregator's reduce/merge must be order-insensitive (Spark partial
  * aggregation applies them in arbitrary partition order) and keep only
  * the trailing n entries. */
class SaxAggregatorSpec extends AnyFunSuite {

  private val agg = new SaxWindowAggregator(8, 4, 4)

  private def entries(vals: (Long, Double)*): Seq[In] =
    vals.map { case (ts, v) => In(ts, ts, v) }

  test("reduce+finish equals trailing-window encode") {
    val ins = entries((1, 1.0), (2, 2.0), (3, 3.0), (4, 10.1), (5, -1.0),
      (6, 4.0), (7, 0.5), (8, 2.5), (9, 9.0), (10, -3.0))
    val b = ins.foldLeft(agg.zero)(agg.reduce)
    val expected = Sax.encodePadded(ins.sortBy(_.ts).map(_.value).toArray, 8, 4, 4)
    assert(agg.finish(b) == expected)
  }

  test("merge is order-insensitive and bounded") {
    val ins = entries((1 to 20).map(i => (i.toLong, math.sin(i.toDouble) * 10)): _*)
    val expected = agg.finish(ins.foldLeft(agg.zero)(agg.reduce))
    // split into interleaved partitions, merge in shuffled orders
    for (seed <- 1 to 10) {
      val rnd = new scala.util.Random(seed)
      val shuffled = rnd.shuffle(ins)
      val parts = shuffled.grouped(4).toSeq
        .map(_.foldLeft(agg.zero)(agg.reduce))
      val merged = rnd.shuffle(parts).foldLeft(agg.zero)(agg.merge)
      assert(merged.entries.length <= 8)
      assert(agg.finish(merged) == expected, s"seed=$seed")
    }
  }

  test("fewer than n entries pad like the ring prefill") {
    val agg2 = new SaxWindowAggregator(4, 2, 4)
    assert(agg2.finish(entries((1, 23.0)).foldLeft(agg2.zero)(agg2.reduce)) == "#C")
  }
}
