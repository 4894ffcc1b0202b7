package graft

import graft.queries.VectorQueries
import org.scalatest.funsuite.AnyFunSuite

/** The ANN/near-dup scale parameterizations: derived quantities must be
  * exact integer functions of the corpus count (so the DuckDB oracle can
  * reproduce them bit-for-bit) and bounded (so the operators stay linear
  * at 100 TB). */
class VectorScalingSpec extends AnyFunSuite {

  test("near-dup plane ladder: base below the cap, +1 per doubling, capped") {
    assert(VectorQueries.planesFor(0) == 8)
    assert(VectorQueries.planesFor(500) == 8)
    assert(VectorQueries.planesFor(16384) == 8)   // at the base cap
    assert(VectorQueries.planesFor(16385) == 9)   // first doubling
    assert(VectorQueries.planesFor(32768) == 9)
    assert(VectorQueries.planesFor(32769) == 10)
    assert(VectorQueries.planesFor(1L << 22) == 16)  // ladder top
    assert(VectorQueries.planesFor(Long.MaxValue) == 16) // hard cap
  }

  test("sign banks: fixed-probe and derived-plane banks are independent") {
    assert(VectorQueries.Signs.length == VectorQueries.NumTables * VectorQueries.NumPlanes)
    assert(VectorQueries.SignsX.length == VectorQueries.NumTables * VectorQueries.MaxPlanes)
    assert(VectorQueries.Signs.flatten.forall(s => s == 1.0 || s == -1.0))
    assert(VectorQueries.SignsX.flatten.forall(s => s == 1.0 || s == -1.0))
    // distinct seeds: the banks must not alias (q41/q42 keep round-1 hashes)
    assert(!VectorQueries.Signs.head.sameElements(VectorQueries.SignsX.head))
  }
}
