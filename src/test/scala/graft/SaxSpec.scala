package graft

import graft.sax.{Sax, SaxWindow, Tables}
import org.scalatest.funsuite.AnyFunSuite

/** Golden vectors ported from the reference's C unit tests
  * (/root/reference/src/symtseries.c:698-967) and Lua end-to-end tests
  * (/root/reference/lua/test.lua) — catalogued in FIXTURES.md §A. */
class SaxSpec extends AnyFunSuite {

  private val NaN = Double.NaN
  private val Inf = Double.PositiveInfinity

  // ---- A.1 batch encode ----------------------------------------------------

  test("golden encode HAED (src/symtseries.c:735-758)") {
    val s = Array(5.0, 6, 7, -5, -6, -7, 0.25, 0.17, 0.04, -0.04, -0.17, -0.25)
    assert(Sax.encode(s, 4, 8) == "HAED")
  }

  test("golden encode FC (lua/test.lua:7-9, README)") {
    assert(Sax.encode(Array(10.3, 7, 1, -5, -5, 7.2), 2, 8) == "FC")
  }

  test("golden encode AD (lua/test.lua:35-37)") {
    assert(Sax.encode(Array(1.0, 2, 3, 10.1), 2, 4) == "AD")
  }

  test("zero encodes to symbol c/2-1+c%2 for all c (src/symtseries.c:704-712)") {
    for (c <- 2 to 16) {
      val sym = Sax.getSymbol(0.0, c)
      assert(sym == c / 2 - 1 + c % 2, s"c=$c")
    }
  }

  test("symbolization at every breakpoint boundary (src/symtseries.c:714-733)") {
    for (c <- 2 to 16; i <- 0 until c - 1) {
      val b = Tables.breaks(c - 2)(i).toDouble
      // value just below the break falls in sector c-i-1; at the break, above
      assert(Sax.getSymbol(b - 1e-7, c) == c - i - 1, s"c=$c i=$i below")
      assert(Sax.getSymbol(b, c) != c - i - 1 || (i < c - 2 && b == Tables.breaks(c - 2)(i + 1).toDouble),
        s"c=$c i=$i at-break")
    }
  }

  test("stationary guard: ~constant series encodes to all zero-symbols (src/symtseries.c:761-794)") {
    val rnd = new scala.util.Random(7)
    val base = Array.fill(60)(8.0 + (rnd.nextDouble() - 0.5) * 2e-2 * 0.99)
    for (w <- 2 to 60; c <- 2 to 16) { // w > 1: check_nwc lower bound
      val n = 60 - 60 % w
      val word = Sax.encode(base.take(n), w, c)
      val zeroChar = (c - (c / 2 - 1 + c % 2) - 1 + 'A').toChar
      assert(word != null && word.forall(_ == zeroChar), s"w=$w c=$c word=$word")
    }
  }

  test("NaN/Inf golden encode ##HAAH (src/symtseries.c:922-940)") {
    val s = Array(NaN, NaN, Inf, -Inf, Inf, 1, -Inf, -1, NaN, -5, 5, NaN)
    assert(Sax.encode(s, 6, 8) == "##HAAH")
  }

  test("Inf-dominated frames: EEA / ECA / E#A / ### / #E# (lua/test.lua:119-166)") {
    // "math.huge" in the Lua fixture is +Inf
    assert(Sax.encode(Array(Inf, Inf, Inf, Inf, Inf, Inf, -Inf, -Inf, -Inf), 3, 5) == "EEA")
    assert(Sax.encode(Array(Inf, Inf, 5, 0, 0, 0, -Inf, -Inf, -5), 3, 5) == "ECA")
    assert(Sax.encode(Array(Inf, Inf, Inf, 0, 0, 0, -Inf, -Inf, -Inf), 3, 5) == "ECA")
    assert(Sax.encode(Array(NaN, 5, 5, 0, 0, 0, NaN, -5, -5), 3, 5) == "ECA")
    assert(Sax.encode(Array(NaN, Inf, Inf, 0, 0, 0, NaN, -Inf, -Inf), 3, 5) == "ECA")
    assert(Sax.encode(Array(Inf, Inf, 5, NaN, NaN, NaN, -Inf, -Inf, -5), 3, 5) == "E#A")
    assert(Sax.encode(Array.fill(9)(NaN), 3, 5) == "###")
    assert(Sax.encode(Array(NaN, Inf, NaN), 3, 5) == "#E#")
  }

  test("invalid encode args return null (lua/test.lua:67-117 bounds)") {
    assert(Sax.encode(Array(1.0, 2, 3), 2, 8) == null)   // n % w != 0
    assert(Sax.encode(Array(1.0, 2, 3, 4), 2, 1) == null) // c too small
    assert(Sax.encode(Array(1.0, 2, 3, 4), 2, 17) == null)
    assert(Sax.encode(null, 2, 8) == null)
    assert(Sax.encode(Array.empty[Double], 1, 8) == null)
  }

  // ---- A.2 sliding window --------------------------------------------------

  test("partial window: add(23) on window(4,2,4) renders #C (lua/test.lua:32-34)") {
    val win = new SaxWindow(4, 2, 4)
    assert(win.append(23) == "#C")
    assert(win.append(1) == "#C" || true) // continue filling
    win.append(2); win.append(3)
    assert(win.append(10.1) == "AD") // trailing 4 = [1,2,3,10.1]
    win.clear()
    assert(win.currentWord == "##")
    assert(Sax.wordsEqual(win.currentWord, Sax.render(Sax.parseSymbols("##", 4), 4)))
  }

  test("encodePadded reproduces ring prefill semantics") {
    assert(Sax.encodePadded(Array(23.0), 4, 2, 4) == "#C")
    assert(Sax.encodePadded(Array(23.0, 1, 2, 3, 10.1), 4, 2, 4) == "AD") // keeps last 4
    assert(Sax.encodePadded(Array.empty[Double], 4, 2, 4) == "##")
  }

  test("sliding window vs batch equivalence + appendAll keeps last n (src/symtseries.c:816-850)") {
    val seq = Array(-1.0, -0.5, -0.25, 0.0, 0.25, 0.5, 1.0, 2.0,
                    -2.0, -1.0, 0.5, 0.25, 0.0, -0.25, -0.5, 1.0)
    val n = 16
    val win = new SaxWindow(n, 8, 4)
    win.appendAll(seq)
    assert(win.currentWord == Sax.encode(seq, 8, 4))
    // slide by one: window should equal batch encode of the shifted series
    win.append(0.0)
    val shifted = seq.drop(1) :+ 0.0
    assert(win.currentWord == Sax.encode(shifted, 8, 4))
    // appendAll of 17 values keeps only the last 16
    val win2 = new SaxWindow(n, 8, 4)
    win2.appendAll(seq :+ 0.0)
    assert(win2.currentWord == win.currentWord)
  }

  // ---- A.3 mindist ---------------------------------------------------------

  test("golden mindist 1.560325 (lua/test.lua:12-18, README)") {
    val a = Sax.encode(Array(10.3, 7, 1, -5, -5, 7.2), 2, 8)
    val win = new SaxWindow(6, 2, 8)
    win.appendAll(Array(-9.0, -8, -7, -5, -5, 7.2))
    val b = win.currentWord
    val md = Sax.mindist(a, 6, b, 6, 8)
    assert(math.abs(md.dist - 1.560325) < 1e-5, md)
    assert(math.abs(md.above - 1.103316) < 1e-5, md)
    assert(math.abs(md.below - 1.103316) < 1e-5, md)
  }

  test("golden mindist ABDD vs DBAA (lua/test.lua:189-195)") {
    val md = Sax.mindist("ABDD", 0, "DBAA", 0, 4)
    assert(math.abs(md.dist - 2.336536) < 1e-5, md)
    assert(math.abs(md.above - 1.907774) < 1e-5, md)
    assert(math.abs(md.below - 1.349000) < 1e-5, md)
  }

  test("NaN frame maps to farthest symbol (lua/test.lua:172-187)") {
    val m1 = Sax.mindist("ABCD", 0, "####", 0, 4)
    val m2 = Sax.mindist("ABCD", 0, "DDAA", 0, 4)
    assert(m1.dist == m2.dist)
    val m3 = Sax.mindist("####", 0, "ABCD", 0, 4) // symmetric
    assert(m3.dist == m1.dist)
    val m4 = Sax.mindist("CCCCC", 0, "#####", 0, 5)
    val m5 = Sax.mindist("CCCCC", 0, "AAAAA", 0, 5) // ties to lowest
    assert(m4.dist == m5.dist)
    assert(m4.above == m4.dist && m4.below == 0.0)
  }

  test("NaN frames equal each other; mindist('#E#','#E#') = 0 (lua/test.lua:164-166)") {
    val md = Sax.mindist("#E#", 0, "#E#", 0, 5)
    assert(md.dist == 0.0)
    assert(Sax.mindist("E#A", 0, "ECA", 0, 5).dist != 0.0)
  }

  test("mindist incompatibilities -> null") {
    assert(Sax.mindist("AB", 0, "ABC", 0, 4) == null)      // different w
    assert(Sax.mindist("AB", 4, "AB", 8, 4) == null)        // different n
    assert(Sax.mindist("AB", 4, "AB", 0, 4) != null)        // wildcard ok
    assert(Sax.mindist("AZ", 0, "AB", 0, 4) == null)        // bad symbol
  }

  test("adjacent symbols have zero mindist; equal words zero") {
    assert(Sax.mindist("AB", 0, "BA", 0, 4).dist == 0.0)
    assert(Sax.mindist("ABDD", 0, "ABDD", 0, 4).dist == 0.0)
  }

  // ---- parse / render round trip ------------------------------------------

  test("parse/render round trip and validation (src/symtseries.c:534-576)") {
    for (c <- 2 to 16) {
      val s = (0 until c).map(i => ('A' + i).toChar).mkString + "#"
      val sym = Sax.parseSymbols(s, c)
      assert(sym != null && Sax.render(sym, c) == s, s"c=$c")
    }
    assert(Sax.parseSymbols("AAABF", 5) == null) // 'F' out of range at c=5
    assert(Sax.parseSymbols("abc", 5) == null)   // lowercase illegal
    assert(Sax.parseSymbols("", 5) == null)
    assert(Sax.parseSymbols("AB", 1) == null)
    assert(Sax.parseSymbols("AB", 17) == null)
  }

  // ---- randomized online-moments property (src/symtseries.c:866-920) ------

  test("online window moments within 1e-2 of batch re-estimation (250x1000 randomized)") {
    val rnd = new scala.util.Random(42)
    val n = 32
    var run = 0
    while (run < 250) {
      val win = new SaxWindow(n, 8, 6)
      val ring = Array.fill(n)(Double.NaN)
      var idx = 0
      var i = 0
      val total = 1000
      while (i < total) {
        val r = rnd.nextDouble()
        val v =
          if (r < 0.1) Double.NaN
          else if (r < 0.15) Inf
          else if (r < 0.2) -Inf
          else (rnd.nextDouble() - 0.5) * 200
        win.push(v)
        ring(idx % n) = v
        idx += 1
        // batch re-estimate over current ring contents
        val (bmu, bstd) = Sax.estimateMuStd(ring)
        assert(math.abs(win.currentMu - bmu) < 1e-2, s"run=$run i=$i mu ${win.currentMu} vs $bmu")
        assert(math.abs(win.currentStd - bstd) < 1e-2, s"run=$run i=$i std ${win.currentStd} vs $bstd")
        i += 1
      }
      run += 1
    }
  }

  test("mindist lower-bounds Euclidean distance of z-normalized series (paper invariant)") {
    val rnd = new scala.util.Random(1)
    for (_ <- 0 until 200) {
      val n = 16; val w = 4; val c = 8
      def series() = Array.fill(n)(rnd.nextDouble() * 10 - 5)
      def znorm(s: Array[Double]) = {
        val (mu, std) = Sax.estimateMuStd(s)
        if (std < Tables.StatEps) s.map(_ => 0.0) else s.map(v => (v - mu) / std)
      }
      val sa = series(); val sb = series()
      val d = Sax.mindist(Sax.encode(sa, w, c), n, Sax.encode(sb, w, c), n, c)
      val za = znorm(sa); val zb = znorm(sb)
      val euclid = math.sqrt(za.zip(zb).map { case (x, y) => (x - y) * (x - y) }.sum)
      assert(d.dist <= euclid + 1e-9, s"mindist ${d.dist} > euclid $euclid")
    }
  }
}
