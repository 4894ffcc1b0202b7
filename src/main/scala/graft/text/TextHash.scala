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

  def md5Hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
    d.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  /** 60-bit hash = first 15 hex chars of md5, as the oracle's
    * CAST(concat('0x', substr(md5(s),1,15)) AS BIGINT). */
  def hash60(s: String): Long = java.lang.Long.parseLong(md5Hex(s).take(15), 16)

  /** Whitespace tokenization after lowercasing — matches the oracle's
    * string_split_regex(lower(trim(text)), '\s+'). */
  def tokenize(text: String): Array[String] = {
    val t = text.toLowerCase.trim
    if (t.isEmpty) Array.empty else t.split("\\s+")
  }

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

  /** LSH band keys: bands of `rows` consecutive signature values, rendered
    * as "band:h1:h2:..." strings (join keys for candidate generation). */
  def bandKeys(sig: Array[Long], rows: Int): Array[String] = {
    val bands = sig.length / rows
    Array.tabulate(bands)(b =>
      (b +: sig.slice(b * rows, (b + 1) * rows).toSeq).mkString(":"))
  }

  /** 32-bit simhash over the token multiset, bit j driven by bit j of each
    * token's 60-bit hash. */
  def simhash32(tokens: Array[String]): Long = {
    val counts = new Array[Long](32)
    var i = 0
    while (i < tokens.length) {
      val h = hash60(tokens(i))
      var j = 0
      while (j < 32) {
        counts(j) += (if (((h >> j) & 1L) == 1L) 1L else -1L)
        j += 1
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 32) {
      if (counts(j) > 0) out |= (1L << j)
      j += 1
    }
    out
  }

  /** Hamming distance between two simhashes. */
  def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
}
