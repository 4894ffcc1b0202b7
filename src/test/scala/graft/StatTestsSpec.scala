package graft

import graft.queries.{RelQueries, TextQueries, VectorQueries}
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The q275–q284 statistics family on planted, hand-computable fixtures.
  * Synthetic frames feed the SAME production derivations the oracle-gated
  * queries run ([[RelQueries.pairDomainOf]] → [[RelQueries.mannWhitneyOf]] /
  * [[RelQueries.ksTwoSampleOf]], [[RelQueries.anovaF]],
  * [[RelQueries.hodgesLehmannOf]], [[RelQueries.pageHinkleyOf]],
  * [[TextQueries.mcnemarOf]], [[VectorQueries.centroidDistances]] →
  * [[VectorQueries.silhouetteOf]] / [[VectorQueries.calinskiHarabaszOf]]),
  * pinned against textbook-arithmetic expectations. */
class StatTestsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = graft.SparkUtil.configure(
      SparkSession.builder().master("local[4]"), "4").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def vals(rows: Seq[(String, Long)]) = {
    val ss = spark; import ss.implicits._
    rows.toDF("event_type", "vq")
  }

  private def means(rows: Seq[(String, Long, Long)]) = {
    val ss = spark; import ss.implicits._
    rows.toDF("event_type", "day", "mq")
  }

  test("Mann–Whitney: fully separated samples give U = 0, AUC = 0") {
    // a = {1,2,3} all below b = {4,5,6}: R_a = 6, U = 0, no ties,
    // sigma2 = (9/12)*7 = 5.25, z = (-9+1)/(2*sqrt(5.25)) = -1.745743...
    val r = RelQueries.mannWhitneyOf(RelQueries.pairDomainOf(vals(
      Seq("a" -> 1L, "a" -> 2L, "a" -> 3L, "b" -> 4L, "b" -> 5L, "b" -> 6L)
    ))).collect()
    assert(r.length == 1)
    val row = r.head
    assert((row.getAs[Long]("n_a"), row.getAs[Long]("n_b")) == (3L, 3L))
    assert(row.getAs[Double]("u") == 0.0)
    assert(row.getAs[Double]("auc") == 0.0)
    assert(row.getAs[Double]("z") == -1.745743)
  }

  test("Mann–Whitney: tied values rank by midrank") {
    // a = {1,1}, b = {1,2}: doubled midrank of 1 is 4, of 2 is 8;
    // 2R_a = 8 so U_a = 1, AUC = 1/4
    val row = RelQueries.mannWhitneyOf(RelQueries.pairDomainOf(vals(
      Seq("a" -> 1L, "a" -> 1L, "b" -> 1L, "b" -> 2L)))).collect().head
    assert(row.getAs[Double]("u") == 1.0)
    assert(row.getAs[Double]("auc") == 0.25)
  }

  test("KS: disjoint supports give D = 1, interleaved give D = 1/2") {
    val d1 = RelQueries.ksTwoSampleOf(RelQueries.pairDomainOf(vals(
      Seq("a" -> 1L, "a" -> 2L, "b" -> 3L, "b" -> 4L)))).collect().head
    assert(d1.getAs[Double]("d") == 1.0)
    assert(d1.getAs[Double]("ks_stat") == 1.0)
    val d2 = RelQueries.ksTwoSampleOf(RelQueries.pairDomainOf(vals(
      Seq("a" -> 1L, "a" -> 3L, "b" -> 2L, "b" -> 4L)))).collect().head
    assert(d2.getAs[Double]("d") == 0.5)
  }

  test("ANOVA F on hand-computed moments") {
    // groups {1,2,3} and {4,5,6}: SSB = 87 - 73.5 = 13.5, SSW = 91 - 87
    // = 4, F = 13.5 / (4/4) = 13.5
    val ss = spark; import ss.implicits._
    val pt = Seq(("a", 3L, 6L, 14L), ("b", 3L, 15L, 77L))
      .toDF("event_type", "n_t", "s_t", "ss_t")
    val row = RelQueries.anovaF(pt).collect().head
    assert((row.getAs[Long]("k"), row.getAs[Long]("n")) == (2L, 6L))
    assert(row.getAs[Double]("ssb") == 13.5)
    assert(row.getAs[Double]("ssw") == 4.0)
    assert(row.getAs[Double]("f") == 13.5)
  }

  test("Hodges–Lehmann: median of the 6 pairwise means of {1,2,4}") {
    // doubled pairwise sums sorted: 20000,30000,40000,50000,60000,80000;
    // lower median (rank 3) = 40000 -> HL = 2.0 value units
    val row = RelQueries.hodgesLehmannOf(means(Seq(
      ("x", 1L, 10000L), ("x", 2L, 20000L), ("x", 3L, 40000L)
    ))).collect().head
    assert(row.getAs[Long]("n_pairs") == 6L)
    assert(row.getAs[Double]("hl") == 2.0)
  }

  test("Page–Hinkley: level shift alarms on its first shifted day") {
    // three days at 0 then three at 100 (mq 1e6): day 4's deviation from
    // the running mean is 75 - delta(0.5) = 74.5 units > lambda = 20;
    // the peak deviation accumulates to 183.5 by day 6
    val r = RelQueries.pageHinkleyOf(means(Seq(
      ("x", 1L, 0L), ("x", 2L, 0L), ("x", 3L, 0L),
      ("x", 4L, 1000000L), ("x", 5L, 1000000L), ("x", 6L, 1000000L)
    ))).collect().head
    assert(r.getAs[Long]("n_days") == 6L)
    assert(r.getAs[Long]("alarm_day") == 4L)
    assert(r.getAs[Double]("max_dev") == 183.5)
  }

  test("Page–Hinkley: a constant series never alarms") {
    val r = RelQueries.pageHinkleyOf(means(
      (1L to 5L).map(d => ("x", d, 70000L)))).collect().head
    assert(r.getAs[Long]("alarm_day") == -1L)
    assert(r.getAs[Double]("max_dev") == 0.0)
  }

  test("McNemar: continuity-corrected chi2 from discordant counts") {
    // b = 4, c = 1 -> chi2 = (|3|-1)^2 / 5 = 0.8
    val ss = spark; import ss.implicits._
    val d = (Seq.fill(3)((true, true)) ++ Seq.fill(2)((false, false)) ++
      Seq.fill(4)((true, false)) ++ Seq.fill(1)((false, true)))
      .toDF("pa", "pb")
    val row = TextQueries.mcnemarOf(d).collect().head
    assert((row.getAs[Long]("b"), row.getAs[Long]("c")) == (4L, 1L))
    assert(row.getAs[Long]("n") == 10L)
    assert(row.getAs[Double]("chi2") == 0.8)
  }

  private def emb(rows: Seq[(Long, Int, Seq[Float])]) = {
    val ss = spark; import ss.implicits._
    rows.toDF("vec_id", "label", "embedding")
  }

  test("silhouette: perfectly separated clusters score 1.0") {
    // every vector sits ON its centroid (a = 0) with the other centroid
    // at distance sqrt(2) (b > 0) -> s = 1 for all four vectors
    val d2 = VectorQueries.centroidDistances(emb(Seq(
      (0L, 0, Seq(1f, 0f)), (1L, 0, Seq(1f, 0f)),
      (2L, 1, Seq(0f, 1f)), (3L, 1, Seq(0f, 1f)))))
    val r = VectorQueries.silhouetteOf(d2).collect()
      .map(x => (x.getAs[Int]("label"),
        (x.getAs[Long]("n"), x.getAs[Double]("mean_sil")))).toMap
    assert(r == Map(0 -> (2L, 1.0), 1 -> (2L, 1.0)))
  }

  test("Calinski–Harabasz on a hand-computed 1-d clustering") {
    // label 0 = {0, 2} (centroid 1), label 1 = {4, 6} (centroid 5),
    // grand mean 3: SSW = 4, SSB = 2*4 + 2*4 = 16, CH = 16 / (4/2) = 8
    val e = emb(Seq((0L, 0, Seq(0f)), (1L, 0, Seq(2f)),
      (2L, 1, Seq(4f)), (3L, 1, Seq(6f))))
    val row = VectorQueries.calinskiHarabaszOf(
      e, VectorQueries.centroidDistances(e)).collect().head
    assert((row.getAs[Long]("k"), row.getAs[Long]("n")) == (2L, 4L))
    assert(row.getAs[Double]("ssb") == 16.0)
    assert(row.getAs[Double]("ssw") == 4.0)
    assert(row.getAs[Double]("ch") == 8.0)
  }

  test("Calinski–Harabasz: zero within-variance reports ch = 0, not NaN") {
    val e = emb(Seq((0L, 0, Seq(1f, 0f)), (1L, 0, Seq(1f, 0f)),
      (2L, 1, Seq(0f, 1f)), (3L, 1, Seq(0f, 1f))))
    val row = VectorQueries.calinskiHarabaszOf(
      e, VectorQueries.centroidDistances(e)).collect().head
    assert(row.getAs[Double]("ssw") == 0.0)
    assert(row.getAs[Double]("ch") == 0.0)
  }

  test("cross-correlation: proportional series give r = 1, opposed give -1") {
    val up = means(Seq(("a", 1L, 10000L), ("a", 2L, 20000L), ("a", 3L, 30000L),
      ("b", 1L, 20000L), ("b", 2L, 40000L), ("b", 3L, 60000L)))
    val r1 = RelQueries.crossCorrelationOf(up).collect().head
    assert(r1.getAs[Long]("n_days") == 3L)
    assert(r1.getAs[Double]("r") == 1.0)
    val down = means(Seq(("a", 1L, 10000L), ("a", 2L, 20000L), ("a", 3L, 30000L),
      ("b", 1L, 30000L), ("b", 2L, 20000L), ("b", 3L, 10000L)))
    assert(RelQueries.crossCorrelationOf(down)
      .collect().head.getAs[Double]("r") == -1.0)
  }

  test("covariance spectrum: a single-variance axis is found exactly") {
    // all variance in dim 1: vectors (0, +/-2) -> C = diag(0, 4);
    // power iteration lands on e_1 exactly, lambda1 = 4, trace = 4
    val e = emb(Seq((0L, 0, Seq(0f, 2f)), (1L, 0, Seq(0f, -2f)),
      (2L, 1, Seq(0f, 2f)), (3L, 1, Seq(0f, -2f))))
    val row = VectorQueries.covarianceSpectrumOf(e).collect().head
    assert((row.getAs[Long]("n"), row.getAs[Long]("dim")) == (4L, 2L))
    assert(row.getAs[Double]("lambda1") == 4.0)
    assert(row.getAs[Double]("trace") == 4.0)
    assert(row.getAs[Double]("explained_share") == 1.0)
    assert(row.getAs[Int]("top_dim") == 1)
  }

  test("covariance spectrum: a planted NULL component fails with the labeled Gram contract") {
    // a null ELEMENT inside the embedding array (not a null array, not a
    // ragged dim — those have their own guards) must surface the
    // GramAggregator contract message, never an opaque deserializer NPE
    val ss = spark; import ss.implicits._
    val e = Seq[(Long, Int, Seq[java.lang.Float])](
      (0L, 0, Seq(1f, 2f)), (1L, 0, Seq(3f, null)))
      .toDF("vec_id", "label", "embedding")
    val ex = intercept[Exception] {
      VectorQueries.covarianceSpectrumOf(e).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(_.contains("null element at component")),
      s"expected the labeled Gram contract failure, got: ${messages(ex).mkString(" | ")}")
  }

  test("covariance spectrum: isotropic 2-d variance splits the trace") {
    // vectors at (+/-2, 0) and (0, +/-2): C = diag(2, 2) -> lambda1 = 2,
    // trace = 4, explained share 0.5; the tie-broken top dim is 0
    val e = emb(Seq((0L, 0, Seq(2f, 0f)), (1L, 0, Seq(-2f, 0f)),
      (2L, 1, Seq(0f, 2f)), (3L, 1, Seq(0f, -2f))))
    val row = VectorQueries.covarianceSpectrumOf(e).collect().head
    assert(row.getAs[Double]("lambda1") == 2.0)
    assert(row.getAs[Double]("trace") == 4.0)
    assert(row.getAs[Double]("explained_share") == 0.5)
    assert(row.getAs[Int]("top_dim") == 0)
  }
}
