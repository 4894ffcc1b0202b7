package graft

import graft.sax.{Sax, SaxWindow, Tables}
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property-based ports of the reference's randomized tests plus the SAX
  * paper invariants (SURVEY.md §5). Uses raw ScalaCheck (no scalatestplus
  * bridge in the offline dependency set). */
class SaxPropertySpec extends AnyFunSuite {

  private def check[A](g: Gen[A])(f: A => Boolean): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(150),
      Prop.forAllNoShrink(g)(f))
    assert(res.passed, res.status.toString)
  }

  private val nwc: Gen[(Int, Int, Int)] = for {
    w <- Gen.choose(2, 16) // check_nwc bounds: w > 1, n > 1
    mult <- Gen.choose(1, 8)
    c <- Gen.choose(2, 16)
  } yield (w * mult, w, c)

  private def randomSeries(rnd: scala.util.Random, len: Int): Array[Double] =
    Array.fill(len) {
      val r = rnd.nextDouble()
      if (r < 0.15) Double.NaN
      else if (r < 0.20) (if (rnd.nextBoolean()) 1 else -1) * Double.PositiveInfinity
      else rnd.nextDouble() * 200 - 100
    }

  test("property: sliding window equals batch encode of trailing values (src/symtseries.c:816-850)") {
    val gen = for { p <- nwc; extra <- Gen.choose(0, 60); seed <- Gen.long } yield (p, extra, seed)
    check(gen) { case ((n, w, c), extra, seed) =>
      val rnd = new scala.util.Random(seed)
      val values = randomSeries(rnd, n + extra)
      val win = new SaxWindow(n, w, c)
      win.appendAll(values) == Sax.encodePadded(values, n, w, c)
    }
  }

  test("property: mindist lower-bounds Euclidean distance of z-normalized series") {
    val gen = for {
      w <- Gen.choose(2, 8); mult <- Gen.choose(1, 8)
      c <- Gen.choose(2, 16); seed <- Gen.long
    } yield (w, mult, c, seed)
    check(gen) { case (w, mult, c, seed) =>
      val n = w * mult
      val rnd = new scala.util.Random(seed)
      def series() = Array.fill(n)(rnd.nextDouble() * 50 - 25)
      def znorm(s: Array[Double]): Array[Double] = {
        val (mu, std) = Sax.estimateMuStd(s)
        if (std < Tables.StatEps) s.map(_ => 0.0) else s.map(v => (v - mu) / std)
      }
      val sa = series(); val sb = series()
      val md = Sax.mindist(Sax.encode(sa, w, c), n, Sax.encode(sb, w, c), n, c)
      val za = znorm(sa); val zb = znorm(sb)
      val euclid = math.sqrt(za.zip(zb).map { case (x, y) => (x - y) * (x - y) }.sum)
      md.dist <= euclid + 1e-9
    }
  }

  private val wordGen: Gen[(String, Int)] = for {
    c <- Gen.choose(2, 16)
    w <- Gen.choose(1, 32)
    chars <- Gen.listOfN(w, Gen.frequency(
      (9, Gen.choose(0, c - 1).map(i => ('A' + i).toChar)),
      (1, Gen.const('#'))))
  } yield (chars.mkString, c)

  test("property: parse/render round-trips every valid word") {
    check(wordGen) { case (s, c) =>
      val sym = Sax.parseSymbols(s, c)
      sym != null && Sax.render(sym, c) == s
    }
  }

  test("property: mindist is symmetric with swapped above/below; zero on equal words") {
    val pairGen = for {
      c <- Gen.choose(2, 16)
      w <- Gen.choose(1, 16)
      gen = Gen.listOfN(w, Gen.frequency(
        (9, Gen.choose(0, c - 1).map(i => ('A' + i).toChar)),
        (1, Gen.const('#'))))
      a <- gen; b <- gen
    } yield (a.mkString, b.mkString, c)
    check(pairGen) { case (a, b, c) =>
      val ab = Sax.mindist(a, 0, b, 0, c)
      val ba = Sax.mindist(b, 0, a, 0, c)
      ab.dist == ba.dist &&
        ab.above == ba.below && ab.below == ba.above &&
        Sax.mindist(a, 0, a, 0, c).dist == 0.0
    }
  }

  test("property: online moments track batch re-estimation within STS_STAT_EPS") {
    val gen = for { logN <- Gen.choose(2, 6); seed <- Gen.long } yield (logN, seed)
    check(gen) { case (logN, seed) =>
      val n = 1 << logN
      val rnd = new scala.util.Random(seed)
      val win = new SaxWindow(n, 2, 4) // w irrelevant to moments; 2 = min valid
      val ring = Array.fill(n)(Double.NaN)
      var ok = true
      var idx = 0
      for (_ <- 0 until 200 if ok) {
        val v = randomSeries(rnd, 1)(0)
        win.push(v)
        ring(idx % n) = v
        idx += 1
        val (bmu, bstd) = Sax.estimateMuStd(ring)
        ok = math.abs(win.currentMu - bmu) < Tables.StatEps &&
          math.abs(win.currentStd - bstd) < Tables.StatEps
      }
      ok
    }
  }
}
