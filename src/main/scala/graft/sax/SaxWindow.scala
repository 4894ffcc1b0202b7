package graft.sax

/** Mutable sliding-window SAX encoder: a NaN-prefilled ring of `n` doubles
  * with O(1) online maintenance of (mu, s2, finiteCnt) per append and O(n)
  * word re-derivation — the streaming-state port of the reference
  * `sts_window` (/root/reference/src/symtseries.c:282-513).
  *
  * The ring starts logically full of NaN (a partially-filled window IS a
  * full-length series with leading NaNs), so every push evicts the head:
  * the buffer always holds n values starting at `head` in insertion order.
  *
  * Serializable so it can live in Structured Streaming `GroupState`.
  */
final class SaxWindow(val n: Int, val w: Int, val c: Int) extends Serializable {
  require(Sax.validNwc(n, w, c), s"invalid (n=$n, w=$w, c=$c)")

  private val buffer: Array[Double] = Array.fill(n)(Double.NaN)
  private var head: Int = 0
  private var mu: Double = 0.0
  private var s2: Double = 0.0
  private var finiteCnt: Long = 0L
  private val symbols: Array[Int] = Array.fill(w)(c)
  private var dirty = false

  @inline private def isFinite(v: Double): Boolean =
    !java.lang.Double.isNaN(v) && !java.lang.Double.isInfinite(v)

  def currentMu: Double = mu
  def currentS2: Double = s2
  def currentFiniteCnt: Long = finiteCnt
  def currentStd: Double = // reference get_window_std, src/symtseries.c:409-414
    if (finiteCnt == 0) 0.0 else math.sqrt(s2 / finiteCnt)

  /** O(1) moment update + ring push; 3-case algebra ported from
    * append_value, src/symtseries.c:434-479. */
  def push(value: Double): Unit = {
    val prevFinite = finiteCnt
    val evicted = buffer(head)
    if (isFinite(value)) finiteCnt += 1
    if (isFinite(evicted)) finiteCnt -= 1
    buffer(head) = value
    head += 1
    if (head == n) head = 0
    val newFinite = finiteCnt

    if (prevFinite == newFinite) {
      // finite<->finite swap, or non-finite<->non-finite: update in the
      // first case only (window's finite size unchanged).
      if (isFinite(value)) {
        val diff = value - evicted
        mu += diff / prevFinite
        val a = value - mu
        val b = evicted - mu
        s2 += diff * diff / newFinite + a * a - b * b
      }
    } else if (newFinite < prevFinite) {
      // added non-finite in place of finite (size decreased)
      if (newFinite == 0) { mu = 0.0; s2 = 0.0 }
      else {
        val prevMu = mu
        mu = (prevMu * prevFinite - evicted) / newFinite
        val oldDiff = prevMu - evicted
        val newDiff = mu - evicted
        s2 += ((oldDiff * oldDiff * prevFinite) / (newFinite.toDouble * newFinite)) -
          newDiff * newDiff
      }
    } else {
      // added finite on an empty place or over a non-finite head
      s2 += ((value - mu) * (value - mu) * prevFinite) / newFinite
      mu += (value - mu) / newFinite
    }
    if (s2 < 0 && s2 > -Tables.StatEps) s2 = 0.0 // fight sqrt(-0)
    dirty = true
  }

  /** Append one value and return the updated SAX word
    * (sts_append_value semantics). */
  def append(value: Double): String = { push(value); currentWord }

  /** Bulk append; only the last n values matter
    * (sts_append_array, src/symtseries.c:494-513). */
  def appendAll(values: Array[Double]): String = {
    val start = if (values.length > n) values.length - n else 0
    var i = start
    while (i < values.length) { push(values(i)); i += 1 }
    currentWord
  }

  /** Current SAX word (re-derived lazily after appends — O(n)). */
  def currentWord: String = {
    if (dirty) {
      Sax.saxTransform(buffer, head, n, w, c, mu, currentStd, symbols)
      dirty = false
    }
    Sax.render(symbols, c)
  }

  /** Reset to the pristine NaN-filled state
    * (sts_reset_window, src/symtseries.c:647-664). */
  def clear(): Unit = {
    java.util.Arrays.fill(buffer, Double.NaN)
    head = 0; mu = 0.0; s2 = 0.0; finiteCnt = 0L
    java.util.Arrays.fill(symbols, c)
    dirty = false
  }

  /** Ring contents in insertion order (oldest first) — for tests and
    * state-checkpoint round-trips. */
  def values: Array[Double] = {
    val out = new Array[Double](n)
    var i = 0
    while (i < n) { out(i) = buffer((head + i) % n); i += 1 }
    out
  }
}

object SaxWindow {
  /** Rebuild a window from checkpointed state (insertion-order values +
    * moments) — the restore half of the reference's serialize_sax
    * (/root/reference/lua/lua_sax.c:293-342). */
  def restore(n: Int, w: Int, c: Int, values: Array[Double],
              mu: Double, s2: Double, finiteCnt: Long): SaxWindow = {
    require(values.length == n, s"state length ${values.length} != n=$n")
    val win = new SaxWindow(n, w, c)
    var i = 0
    while (i < n) { win.buffer(i) = values(i); i += 1 }
    win.head = 0
    win.mu = mu
    win.s2 = s2
    win.finiteCnt = finiteCnt
    win.dirty = true
    win
  }
}
