package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** q319 (epoch shard plan) — the curation→trainer handoff: each epoch's
  * seeded permutation must be deterministic, deal the SAME kept corpus
  * (totals conserved across epochs), cut balanced shards, and actually
  * RESHUFFLE between epochs (the per-shard order signatures move). The
  * value arithmetic itself is oracle-gated; this spec pins the
  * epoch-plan semantics the oracle's row-hash alone doesn't name. */
class EpochShardSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val dir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = graft.SparkUtil.configure(
      SparkSession.builder().master("local[4]"), "4").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def plan(): Seq[(String, Int, Long, Long, Long)] = {
    val ss = spark
    import ss.implicits._
    SparkEntry.queries("q319_epoch_shard_plan")(spark, dir)
      .as[(String, Int, Long, Long, Long)].collect().toSeq.sorted
  }

  test("epochs conserve the corpus, shards balance, and the permutation moves") {
    val rows = plan()
    val byEpoch = rows.groupBy(_._1)
    assert(byEpoch.keySet == Set("e1", "e2"))
    assert(rows.length == 16, s"2 epochs x 8 shards expected: ${rows.length}")
    // same kept corpus dealt in every epoch
    val totals = byEpoch.view.mapValues(r =>
      (r.map(_._3).sum, r.map(_._4).sum)).toMap
    assert(totals("e1") == totals("e2"),
      s"epochs dealt different corpora: $totals")
    // ntile balance: shard doc counts differ by at most one
    byEpoch.foreach { case (e, r) =>
      val n = r.map(_._3)
      assert(n.max - n.min <= 1L, s"epoch $e shards unbalanced: $n")
    }
    // a reshuffle that does not reshuffle is a bug: the per-shard order
    // signatures (and the shard contents behind them) must move
    val sig = byEpoch.view.mapValues(_.sortBy(_._2).map(_._5)).toMap
    assert(sig("e1") != sig("e2"),
      "epoch seeds produced the identical permutation")
    // determinism: the plan is a pure function of (corpus, seed)
    assert(plan() == rows, "epoch plan is not deterministic")
  }
}
