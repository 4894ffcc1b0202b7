package graft

import graft.sax.{Sax, SaxWindow}
import org.scalatest.funsuite.AnyFunSuite

/** Port of the reference's negative-validation table (lua/test.lua:67-117,
  * bounds at lua/lua_sax.c:26-35, C NULL returns at
  * src/symtseries.c:301-304,515-524,534-541). The Lua layer raises errors;
  * this library returns null/throws on construction — each rejected input
  * maps to one of those. */
class SaxValidationSpec extends AnyFunSuite {

  private val good = Array(1.0, 2, 3, 4)

  test("encode rejects bad (n, w, c) combinations") {
    assert(Sax.encode(good, 3, 4) == null)        // n % w != 0
    assert(Sax.encode(good, 0, 4) == null)        // w = 0
    assert(Sax.encode(good, 1, 4) == null)        // w = 1 (word.new({1,2,3},1,5))
    assert(Sax.encode(good, 2, 0) == null)        // c < 2
    assert(Sax.encode(good, 2, 1) == null)
    assert(Sax.encode(good, 2, 17) == null)       // c > 16
    assert(Sax.encode(good, 2, 255) == null)
    assert(Sax.encode(Array.empty[Double], 1, 4) == null) // empty series
    assert(Sax.encode(Array(1.0), 1, 4) == null)  // n = 1 below min
    assert(Sax.encode(null, 2, 4) == null)        // null series
    // n > 4096 rejected even when divisible (check_nwc upper bound)
    assert(Sax.encode(Array.fill(5000)(1.0), 5, 5) == null)
    assert(Sax.encode(Array.fill(4096)(1.0), 2, 4) != null) // at the cap
    for (c <- 2 to 16)                            // all valid c accept
      assert(Sax.encode(good, 2, c) != null, s"c=$c")
  }

  test("window construction rejects bad params (sts_new_window + check_nwc)") {
    intercept[IllegalArgumentException](new SaxWindow(5, 2, 4))    // n % w != 0
    intercept[IllegalArgumentException](new SaxWindow(4, 0, 4))    // w = 0
    intercept[IllegalArgumentException](new SaxWindow(1, 3, 3))    // n = 1 (test.lua:73)
    intercept[IllegalArgumentException](new SaxWindow(9, 1, 3))    // w = 1 (test.lua:74)
    intercept[IllegalArgumentException](new SaxWindow(4, 2, 1))    // c < 2 (test.lua:75)
    intercept[IllegalArgumentException](new SaxWindow(4, 2, 17))   // c > 16 (test.lua:76)
    intercept[IllegalArgumentException](new SaxWindow(5000, 5, 5)) // n > 4096 (test.lua:77)
    intercept[IllegalArgumentException](new SaxWindow(10, 3, 3))   // n % w != 0 (test.lua:78)
    intercept[IllegalArgumentException](new SaxWindow(8192, 4096, 4)) // w > 2048
    new SaxWindow(4, 2, 2)       // minimum valid cardinality accepted
    new SaxWindow(4, 2, 16)
    new SaxWindow(4096, 2048, 4) // at both caps
  }

  test("parse rejects malformed SAX strings (sts_from_sax_string)") {
    assert(Sax.parseSymbols("", 5) == null)        // empty
    assert(Sax.parseSymbols(null, 5) == null)      // null
    assert(Sax.parseSymbols("AAABF", 5) == null)   // 'F' >= 'A'+5
    assert(Sax.parseSymbols("abc", 5) == null)     // lowercase
    assert(Sax.parseSymbols("AB1", 5) == null)     // digit
    assert(Sax.parseSymbols("A B", 5) == null)     // space
    assert(Sax.parseSymbols("AB", 1) == null)      // c below min
    assert(Sax.parseSymbols("AB", 17) == null)     // c above max
    assert(Sax.parseSymbols("P", 16) != null)      // 'P' = 'A'+15, valid at max c
    assert(Sax.parseSymbols("Q", 16) == null)      // 'Q' = 'A'+16, out of range
    assert(Sax.parseSymbols("####", 2) != null)    // all-sentinel valid
  }

  test("mindist rejects incompatible word pairs (sts_mindist_ab NaN returns)") {
    assert(Sax.mindist(null, 0, "AB", 0, 4) == null)
    assert(Sax.mindist("AB", 0, null, 0, 4) == null)
    assert(Sax.mindist("AB", 0, "ABC", 0, 4) == null)   // w mismatch
    assert(Sax.mindist("AB", 4, "AB", 8, 4) == null)    // n mismatch, both known
    assert(Sax.mindist("AB", 0, "AB", 0, 1) == null)    // bad c
    assert(Sax.mindist("AB", 0, "AB", 0, 17) == null)
    // n reconciliation: wildcard adopts the other side (header doc
    // include/symtseries.h:113-115)
    assert(Sax.mindist("AB", 4, "AB", 0, 4) != null)
    assert(Sax.mindist("AB", 0, "AB", 4, 4) != null)
    assert(Sax.mindist("AB", 0, "AB", 0, 4) != null)    // both wildcard: n := w
  }

  test("appendAll with more than n values keeps only the last n") {
    val win = new SaxWindow(4, 2, 4)
    win.appendAll((1 to 100).map(_.toDouble).toArray)
    assert(win.currentWord == Sax.encode(Array(97.0, 98, 99, 100), 2, 4))
  }
}
