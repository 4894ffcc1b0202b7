package graft

import graft.queries.VectorQueries
import org.scalatest.funsuite.AnyFunSuite

/** The ANN/near-dup scale parameterizations: derived quantities must be
  * exact integer functions of the corpus count (so the DuckDB oracle can
  * reproduce them bit-for-bit) and bounded (so the operators stay linear
  * at 100 TB). */
class VectorScalingSpec extends AnyFunSuite {

  test("recall ladder: the nprobe and OPQ knobs never lower recall") {
    // the r9 measured ordering, pinned at the fixture scale: multi-cell
    // probing can only ADD candidates (q101 vs q99), and the OPQ
    // permutation preserves L2 while lowering quantization error on
    // these correlated dims (q105 vs q90). Equality is legitimate
    // (sf0.001's few cells bound what nprobe can recover); a DROP means
    // someone broke the knob.
    val spark = graft.SparkUtil.configure(
      org.apache.spark.sql.SparkSession.builder().master("local[4]"), "4").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val dir = "/root/testdata/sf0.001"
      def recall(name: String): Double = {
        val v = VectorQueries.defs(name)(spark, dir).collect().head.getDouble(1)
        spark.catalog.clearCache()
        v
      }
      val (r99, r101) = (recall("q99_ivf_adc_recall"), recall("q101_ivfadc_nprobe_recall"))
      val r133 = recall("q133_ivfadc_np5_recall")
      assert(r133 >= r101, s"nprobe=5 recall $r133 below nprobe=3 $r101")
      val (r90, r105) = (recall("q90_pq_recall"), recall("q105_opq_recall"))
      val r111 = recall("q111_ivf_nprobe_recall")
      val r113 = recall("q113_sq8_recall")
      assert(r101 >= r99, s"nprobe=3 recall $r101 below single-cell $r99")
      assert(r105 >= r90, s"OPQ recall $r105 below contiguous $r90")
      // SQ8 keeps 64 int8 components where PQ keeps 8 codes: 8x the
      // bytes must buy at least the OPQ-ADC recall (0.98 vs 0.30
      // measured at sf0.01 — near-exact ranking, the fidelity end of
      // the compression ladder)
      assert(r113 >= r105, s"SQ8 recall $r113 below OPQ-ADC $r105")
      // the exact probe IS the routing ceiling: over the same probed
      // cells, exact scoring keeps every truth candidate routing kept,
      // so ADC under it can never exceed it (a theorem, not a fixture)
      assert(r111 >= r101, s"ADC recall $r101 above its routing ceiling $r111")
      assert(r99 > 0.0 && r90 > 0.0, "degenerate zero recall")
    } finally spark.stop()
  }

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
