package graft.queries

import scala.collection.immutable.ArraySeq

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.Encoder

/** Partial-Gram accumulation for q286's covariance matrix: one buffer of
  * dim² BIGINT cells per partition, fed a micro-quantized centered
  * component array per row and emitting the flat row-major Σ cᵢcᵀᵢ sum.
  *
  * This replaces the r12–r13 posexplode-of-posexplode plan, which emitted
  * dim² rows per VECTOR (and carried the full centered array on every row
  * of the first explode) before the partial aggregation collapsed them —
  * |corpus|·dim rows of dim-array payload through the generator stage.
  * Here the corpus-sized stage stays |corpus| rows: each task folds its
  * vectors into one dim²-long buffer (the q65/q254 combinable-moments
  * discipline), and the shuffle carries one ~dim²·8-byte buffer per
  * partition regardless of corpus size. Cell values are the identical
  * exact BIGINT sums (integer addition is associative and commutative),
  * so the downstream algebra and the DuckDB oracle replay are untouched.
  */
class GramAggregator extends Aggregator[Seq[java.lang.Long], Array[Long], Seq[Long]] {

  override def zero: Array[Long] = Array.emptyLongArray

  override def reduce(b: Array[Long], a: Seq[java.lang.Long]): Array[Long] = {
    if (a == null) return b
    // the input type is BOXED so a null ELEMENT reaches this labeled
    // contract check instead of dying as an opaque deserializer NPE
    // (r14/r15 ADVICE): a sparse/NULL component has no defined Gram
    // contribution — scrub or impute upstream
    val d = a.length
    val arr = new Array[Long](d)
    var i = 0
    while (i < d) {
      val v = a(i)
      require(v != null,
        s"graft GramAggregator: null element at component $i of a $d-dim " +
          "vector — the embedding-dim contract requires dense non-null " +
          "components (scrub or impute nulls before the Gram fold)")
      arr(i) = v.longValue(); i += 1
    }
    val buf = if (b.length == d * d) b else {
      require(b.isEmpty, s"inconsistent embedding dims: ${b.length} vs $d²")
      new Array[Long](d * d)
    }
    var j = 0
    while (j < d) {
      val cj = arr(j)
      val row = j * d
      var k = 0
      while (k < d) { buf(row + k) += cj * arr(k); k += 1 }
      j += 1
    }
    buf
  }

  override def merge(x: Array[Long], y: Array[Long]): Array[Long] =
    if (x.isEmpty) y
    else if (y.isEmpty) x
    else {
      // same dimension guard as reduce(): a ragged input must fail loudly,
      // never silently drop the longer buffer's tail cells
      require(x.length == y.length,
        s"inconsistent Gram buffers: ${x.length} vs ${y.length}")
      var i = 0
      while (i < x.length) { x(i) += y(i); i += 1 }
      x
    }

  override def finish(b: Array[Long]): Seq[Long] = ArraySeq.unsafeWrapArray(b)

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()

  override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
}
