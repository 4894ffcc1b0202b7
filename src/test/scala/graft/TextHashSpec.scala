package graft

import graft.text.TextHash
import org.scalatest.funsuite.AnyFunSuite

/** The hash values are a cross-engine contract (the DuckDB oracle
  * recomputes them from md5 hex) — pin them. */
class TextHashSpec extends AnyFunSuite {

  test("hash60 matches CAST(concat('0x', substr(md5(s),1,15)) AS BIGINT)") {
    // golden values cross-checked against DuckDB
    assert(TextHash.hash60("abc") == 648541476951500027L)
    assert(TextHash.hash60("hello world") == 426544247714475757L)
    assert(TextHash.hash60("the fast key") == 616507337004840205L)
  }

  test("md5Hex matches the standard hex digest") {
    assert(TextHash.md5Hex("abc") == "900150983cd24fb0d6963f7d28e17f72")
    assert(TextHash.md5Hex("") == "d41d8cd98f00b204e9800998ecf8427e")
  }

  test("shingles: distinct 3-grams with short-doc fallback") {
    assert(TextHash.shingles(Array("a", "b", "c", "d"), 3).toSeq == Seq("a b c", "b c d"))
    assert(TextHash.shingles(Array("a", "b"), 3).toSeq == Seq("a b"))
    assert(TextHash.shingles(Array("a", "b", "a", "b", "a", "b"), 3).toSeq ==
      Seq("a b a", "b a b")) // distinct
  }

  test("minhash is permutation-monotone and deterministic") {
    val s1 = TextHash.minhash(Array("x y z", "y z w"))
    val s2 = TextHash.minhash(Array("x y z", "y z w"))
    assert(s1.toSeq == s2.toSeq)
    assert(s1.length == TextHash.NumHashes)
    assert(s1.forall(v => v >= 0 && v < TextHash.P))
    // superset can only lower each signature slot
    val s3 = TextHash.minhash(Array("x y z", "y z w", "q r s"))
    assert(s1.zip(s3).forall { case (a, b) => b <= a })
  }

  test("simhash: 60 bits, hamming 0 to itself, band arithmetic") {
    val h = TextHash.simhash(Array("the", "fast", "key", "order"))
    assert((h >>> TextHash.SimBits) == 0L)
    assert(TextHash.hamming(h, h) == 0)
    val bands = (0 until TextHash.SimBands).map(j =>
      (h >> (TextHash.SimBandBits * j)) & ((1L << TextHash.SimBandBits) - 1))
    assert(bands.zipWithIndex.map { case (b, j) => b << (TextHash.SimBandBits * j) }
      .reduce(_ | _) == h)
  }
}
