package graft

import graft.sax.{Sax, SaxCodegenOps}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.scalatest.funsuite.AnyFunSuite

/** The ArrayData adapter behind the native expressions: null elements map
  * to NaN ('#' semantics), invalid params return null, results equal the
  * pure-Scala core. */
class SaxCodegenOpsSpec extends AnyFunSuite {

  private def arr(vs: Any*): ArrayData =
    ArrayData.toArrayData(vs.map {
      case null => null
      case d: Double => java.lang.Double.valueOf(d)
      case x => x
    }.toArray)

  test("encode matches Sax.encode; null elements become NaN frames") {
    val a = arr(1.0, 2.0, 3.0, 10.1)
    assert(SaxCodegenOps.encode(a, 2, 4).toString == "AD")
    val withNulls = arr(null, null, 1.0, 2.0)
    assert(SaxCodegenOps.encode(withNulls, 2, 4).toString ==
      Sax.encode(Array(Double.NaN, Double.NaN, 1.0, 2.0), 2, 4))
    assert(SaxCodegenOps.encode(arr(1.0, 2.0, 3.0), 2, 4) == null) // n%w
  }

  test("encodeWindow pads and truncates like the ring") {
    assert(SaxCodegenOps.encodeWindow(arr(23.0), 4, 2, 4).toString == "#C")
    assert(SaxCodegenOps.encodeWindow(arr(23.0, 1.0, 2.0, 3.0, 10.1), 4, 2, 4)
      .toString == "AD")
  }

  test("paa matches Sax.paaNormalized; null elements become NaN; invalid -> null") {
    val vs = Array(10.3, 7.0, 1.0, -5.0, -5.0, 7.2)
    val got = SaxCodegenOps.paa(arr(vs.map(v => v: Any): _*), 2)
    assert(got.toDoubleArray().toSeq == Sax.paaNormalized(vs, 2).toSeq)
    val withNull = SaxCodegenOps.paa(arr(null, null, 1.0, 2.0), 2)
    val expect = Sax.paaNormalized(Array(Double.NaN, Double.NaN, 1.0, 2.0), 2)
    assert(withNull.numElements() == 2)
    assert(withNull.getDouble(0).isNaN == expect(0).isNaN)
    assert(withNull.getDouble(1) == expect(1))
    assert(SaxCodegenOps.paa(arr(1.0, 2.0, 3.0), 2) == null) // n % w != 0
    assert(SaxCodegenOps.paa(null, 2) == null)
  }

  test("mindist returns struct rows / null like the core") {
    import org.apache.spark.unsafe.types.UTF8String
    val r = SaxCodegenOps.mindist(
      UTF8String.fromString("ABDD"), 0L, UTF8String.fromString("DBAA"), 0L, 4)
    assert(math.abs(r.getDouble(0) - 2.336536) < 1e-5)
    assert(SaxCodegenOps.mindist(
      UTF8String.fromString("AB"), 0L, UTF8String.fromString("ABC"), 0L, 4) == null)
    assert(SaxCodegenOps.mindist(null, 0L, UTF8String.fromString("AB"), 0L, 4) == null)
  }
}
