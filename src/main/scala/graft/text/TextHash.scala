package graft.text

/** Deterministic text hashing primitives shared by the dedup / fingerprint
  * operators. All hashes are derived from MD5 hex so the DuckDB oracle can
  * reproduce them exactly (`md5()` is identical in both engines; the first
  * 15 hex chars parse into a non-negative 60-bit BIGINT in both).
  */
object TextHash {

  /** Mersenne prime 2^31 - 1: modulus for the minhash permutations. Keeps
    * a*h products within int64 (h reduced below 2^31 first). */
  final val P: Long = 2147483647L

  /** Fixed odd multiplier/offset pairs for the minhash permutation family
    * (h_j = (a_j * h + b_j) mod P). Generated once from a seeded LCG; the
    * literals are the contract — the oracle embeds the same values. */
  final val NumHashes = 16
  val HashA: Array[Long] = {
    var x = 1234567891L
    Array.fill(NumHashes) { x = (x * 6364136223846793005L + 1442695040888963407L) & Long.MaxValue; x % (P - 2) + 1 }
  }
  val HashB: Array[Long] = {
    var x = 987654321L
    Array.fill(NumHashes) { x = (x * 6364136223846793005L + 1442695040888963407L) & Long.MaxValue; x % P }
  }

  private val Hex = "0123456789abcdef".toCharArray
  private val DigestTL = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  private def md5Bytes(s: String): Array[Byte] = {
    val d = DigestTL.get()
    d.reset()
    d.digest(s.getBytes("UTF-8"))
  }

  def md5Hex(s: String): String = {
    val b = md5Bytes(s)
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = Hex((b(i) >> 4) & 0xf)
      out(2 * i + 1) = Hex(b(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  /** 60-bit hash = first 15 hex chars of md5 (7 bytes + high nibble of the
    * 8th), as the oracle's CAST(concat('0x', substr(md5(s),1,15)) AS
    * BIGINT). Computed from the digest bytes directly — no hex string. */
  def hash60(s: String): Long = {
    val b = md5Bytes(s)
    var h = 0L
    var i = 0
    while (i < 7) { h = (h << 8) | (b(i) & 0xffL); i += 1 }
    (h << 4) | ((b(7) & 0xffL) >>> 4)
  }

  /** Whitespace tokenization after lowercasing: split on \s+ and drop
    * empty tokens. The filter-nonempty formulation is what ALL surfaces
    * use (TextSql.toks in DuckDB, filter(split(...)) in Spark SQL), so
    * leading/trailing whitespace and empty text behave identically
    * everywhere — engine trim() functions differ on non-space whitespace
    * and empty splits, filters don't. */
  def tokenize(text: String): Array[String] =
    text.toLowerCase.split("\\s+").filter(_.nonEmpty)

  /** k-word shingles joined by a single space, distinct. Shorter-than-k
    * token lists produce a single shingle of all tokens (so no doc is
    * unrepresentable). */
  def shingles(tokens: Array[String], k: Int): Array[String] = {
    if (tokens.length <= k) Array(tokens.mkString(" "))
    else {
      val out = new Array[String](tokens.length - k + 1)
      var i = 0
      while (i + k <= tokens.length) {
        out(i) = tokens.slice(i, i + k).mkString(" ")
        i += 1
      }
      out.distinct
    }
  }

  /** Minhash signature over the distinct shingle set. */
  def minhash(shingleSet: Array[String]): Array[Long] = {
    val sig = Array.fill(NumHashes)(Long.MaxValue)
    var i = 0
    while (i < shingleSet.length) {
      val h = hash60(shingleSet(i)) % P
      var j = 0
      while (j < NumHashes) {
        val v = (HashA(j) * h + HashB(j)) % P
        if (v < sig(j)) sig(j) = v
        j += 1
      }
      i += 1
    }
    sig
  }

  /** LSH band geometry: 4 bands of 4 consecutive signature values. The ONE
    * definition every surface derives from — the Spark band expressions,
    * the oracle SQL fragments, and the drift-pin specs all read these, so a
    * geometry change cannot silently diverge between them. */
  final val BandRows = 4
  final val NumBands = NumHashes / BandRows // 4

  /** LSH band keys: bands of `rows` consecutive signature values, rendered
    * as "band:h1:h2:..." strings (join keys for candidate generation). */
  def bandKeys(sig: Array[Long], rows: Int): Array[String] = {
    val bands = sig.length / rows
    Array.tabulate(bands)(b =>
      (b +: sig.slice(b * rows, (b + 1) * rows).toSeq).mkString(":"))
  }

  /** Simhash width: 60 bits (full width of the md5-derived token hash).
    * Split into 4 bands of 15 bits for blocking — by pigeonhole, any pair
    * within Hamming distance 3 shares at least one identical band. */
  final val SimBits = 60
  final val SimBands = 4
  final val SimBandBits = SimBits / SimBands // 15

  /** 60-bit simhash over the token multiset, bit j driven by bit j of each
    * token's 60-bit hash. */
  def simhash(tokens: Array[String]): Long = {
    val counts = new Array[Long](SimBits)
    var i = 0
    while (i < tokens.length) {
      val h = hash60(tokens(i))
      var j = 0
      while (j < SimBits) {
        counts(j) += (if (((h >> j) & 1L) == 1L) 1L else -1L)
        j += 1
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < SimBits) {
      if (counts(j) > 0) out |= (1L << j)
      j += 1
    }
    out
  }

  /** Hamming distance between two simhashes. */
  def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
}
