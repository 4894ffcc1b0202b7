package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The q89/q90 product-quantization training step beyond the DuckDB
  * oracle: (1) the distributed multi-iteration Lloyd update must equal a
  * driver-side recompute with the identical quantized arithmetic, and
  * (2) on a corpus with planted cluster structure the trained codebook
  * must separate the clusters — ADC recall@5 of exactly 1.0 — proving the
  * layout delivers ANN quality, not just the serving plan shape. */
class PqTrainingSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val dir = "/root/testdata/sf0.001"
  private val M = 8
  private val SubDim = 8
  private val K = 32
  private val Iters = 2

  override def beforeAll(): Unit = {
    spark = graft.SparkUtil.configure(
      SparkSession.builder().master("local[4]"), "4").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def r6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6

  /** pqDist's exact arithmetic: sequential index-order double fold. */
  private def d2(a: Array[Double], b: Array[Double]): Double = {
    var acc = 0.0
    var i = 0
    while (i < a.length) { val d = a(i) - b(i); acc += d * d; i += 1 }
    r6(acc)
  }

  test("trained codebook equals a driver-side Lloyd-iteration recompute") {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def sl(v: Array[Float], s: Int): Array[Double] =
      v.slice(s * SubDim, (s + 1) * SubDim).map(_.toDouble)
    val seeds = (0 until M).map(s => (0 until K).map(k => sl(emb(k.toLong), s)))
    // Iters rounds of (argmin (rounded d2, cent_id) assignment ->
    // xsum-quantized mean update); an empty cell keeps its PREVIOUS
    // centroid, matching pqCodebookFrom's coalesce
    var cb: IndexedSeq[IndexedSeq[Array[Double]]] = seeds
    for (_ <- 1 to Iters) {
      val prev = cb
      val assigned = for (s <- 0 until M) yield
        emb.toSeq.map { case (id, v) =>
          val sv = sl(v, s)
          id -> (0 until K).minBy(k => (d2(sv, prev(s)(k)), k))
        }.groupMap(_._2)(x => sl(emb(x._1), s))
      cb = for (s <- 0 until M) yield (0 until K).map { k =>
        assigned(s).get(k) match {
          case Some(vs) => (0 until SubDim).map(i =>
            r6(vs.map(v => math.floor(v(i) * 1e6 + 0.5)).sum / 1e6 / vs.size)).toArray
          case None => prev(s)(k)
        }
      }
    }
    val expected = (for (s <- 0 until M; k <- 0 until K) yield (s, k) -> cb(s)(k)).toMap
    val got = VectorQueries.pqCodebook(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1).toInt) -> r.getSeq[Double](2).toArray).toMap
    assert(got.keySet == expected.keySet, "M x K codebook entries")
    for ((key, exp) <- expected)
      assert(java.util.Arrays.equals(got(key), exp), s"centroid $key")
    // the iterations MOVED the codebook (it is trained, not the raw seeds)
    assert(expected.exists { case ((s, k), ce) => !java.util.Arrays.equals(ce, seeds(s)(k)) })
  }

  test("planted clusters: trained ADC achieves recall@5 = 1.0") {
    // 8 orthogonal cluster centers, distinguishable in EVERY subspace
    // (center j puts mass on dim 16*b + j of each block b); 6 members per
    // cluster (cluster = vec_id % 8, 48 vectors) with tiny deterministic
    // jitter, so each query's 5 in-cluster candidates are the exact top-5
    // under both ADC (same codes -> near-zero table distance) and the
    // brute-force cosine truth — any cross-cluster leak breaks recall.
    val tmp = java.nio.file.Files.createTempDirectory("graft-pq").toString
    val rows = (0 until 48).map { v =>
      val c = v % 8
      val e = Array.fill(64)(0.001f * ((v / 8) + 1)) // off-axis jitter
      for (b <- 0 until 4) e(16 * b + c) = 0.5f
      (v.toLong, e.toSeq, s"c$c")
    }
    val ss = spark
    import ss.implicits._
    rows.toDF("vec_id", "embedding", "label").write.mode("overwrite")
      .parquet(s"$tmp/embeddings.parquet")

    val recall = VectorQueries.defs("q90_pq_recall")(spark, tmp).collect().head
    assert(recall.getLong(0) == 10, "10 query vectors")
    assert(recall.getDouble(1) == 1.0, s"planted-cluster recall: $recall")

    // and the approximate top-5 really is the query's own cluster
    val top = VectorQueries.defs("q89_pq_adc")(spark, tmp).collect()
    for (r <- top)
      assert(r.getLong(1) % 8 == r.getLong(0) % 8,
        s"query ${r.getLong(0)} matched out-of-cluster ${r.getLong(1)}")
  }
}
