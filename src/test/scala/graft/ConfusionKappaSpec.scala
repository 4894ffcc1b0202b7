package graft

import graft.queries.VectorQueries
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The q268/q269 classifier-audit family on planted fixtures: the
  * centroid-assignment confusion counts (argmax by cosine with the
  * smallest-label tie-break, halves merged under the (+,+) state) and
  * Cohen's kappa / accuracy on hand-computable confusion matrices.
  * Synthetic frames feed the SAME production derivations the oracle-gated
  * queries run ([[VectorQueries.centroidConfusionOf]] /
  * [[VectorQueries.kappaOf]]). */
class ConfusionKappaSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = graft.SparkUtil.configure(
      SparkSession.builder().master("local[4]"), "4").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def emb(rows: Seq[(Long, Int, Seq[Float])]) = {
    val ss = spark; import ss.implicits._
    rows.toDF("vec_id", "label", "embedding")
  }

  test("confusion counts: clean clusters plus one planted mislabel") {
    // label 0 lives at (1,0), label 1 at (0,1); vec 2 is labeled 0 but
    // sits at (0,1) — centroid 0 becomes (2/3, 1/3), still closer to the
    // two true (1,0) vectors, so exactly one off-diagonal cell appears
    val cm = VectorQueries.centroidConfusionOf(emb(Seq(
      (0L, 0, Seq(1f, 0f)), (1L, 0, Seq(1f, 0f)), (2L, 0, Seq(0f, 1f)),
      (3L, 1, Seq(0f, 1f)), (4L, 1, Seq(0f, 1f)), (5L, 1, Seq(0f, 1f))
    ))).collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSet
    assert(cm == Set((0, 0, 2L), (0, 1, 1L), (1, 1, 3L)))
  }

  test("argmax tie-break picks the SMALLEST label") {
    // both labels hold the identical vector set, so both centroids are
    // (0.5, 0.5) and every score ties exactly — the struct-max tie-break
    // (score, -label) must send every vector to label 0
    val cm = VectorQueries.centroidConfusionOf(emb(Seq(
      (0L, 0, Seq(1f, 0f)), (1L, 0, Seq(0f, 1f)),
      (2L, 1, Seq(1f, 0f)), (3L, 1, Seq(0f, 1f))
    ))).collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSet
    assert(cm == Set((0, 0, 2L), (1, 0, 2L)))
  }

  test("kappa/accuracy on a hand-computed confusion matrix") {
    // N=50, diag=35, rows (25,25), cols (30,20), Σrc=1250:
    // accuracy = 35/50 = 0.7; kappa = (50·35 − 1250)/(2500 − 1250) = 0.4
    val ss = spark; import ss.implicits._
    val cm = Seq((0L, 0L, 20L), (0L, 1L, 5L), (1L, 0L, 10L), (1L, 1L, 15L))
      .toDF("label", "pred", "n")
    val r = VectorQueries.kappaOf(cm).collect().head
    assert(r.getLong(0) == 50L && r.getLong(1) == 35L)
    assert(r.getDouble(2) == 0.7)
    assert(r.getDouble(3) == 0.4)
  }

  test("kappa degenerate guard: one cell, pe = 1, kappa pinned to 0") {
    val ss = spark; import ss.implicits._
    val cm = Seq((0L, 0L, 5L)).toDF("label", "pred", "n")
    val r = VectorQueries.kappaOf(cm).collect().head
    assert(r.getLong(0) == 5L && r.getLong(1) == 5L)
    assert(r.getDouble(2) == 1.0) // accuracy
    assert(r.getDouble(3) == 0.0) // N² − Σrc = 0 → guard, not a NaN
  }

  test("end-to-end: kappa of the planted-mislabel confusion") {
    // from the first fixture: N=6, diag=5, rows (3,3), cols (2,4),
    // Σrc = 18 → accuracy = 5/6 ≈ 0.833333, kappa = 12/18 ≈ 0.666667
    val cm = VectorQueries.centroidConfusionOf(emb(Seq(
      (0L, 0, Seq(1f, 0f)), (1L, 0, Seq(1f, 0f)), (2L, 0, Seq(0f, 1f)),
      (3L, 1, Seq(0f, 1f)), (4L, 1, Seq(0f, 1f)), (5L, 1, Seq(0f, 1f))
    )))
    val r = VectorQueries.kappaOf(cm).collect().head
    assert(r.getLong(0) == 6L && r.getLong(1) == 5L)
    assert(r.getDouble(2) == 0.833333)
    assert(r.getDouble(3) == 0.666667)
  }
}
