package graft

import graft.queries.RelQueries
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** q130/q131 — the one-pass log-domain quantile sketch. The oracle gate
  * proves cross-engine parity on the real tables; these tests pin the
  * sketch THEOREMS on adversarial data the fixtures don't contain:
  * exact zeros (the low store), a heavy constant mode (single-value
  * bins), a 8-decade dynamic range (the fixed grid needs no [lo, hi]),
  * and values straddling bin boundaries. */
class DdSketchSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var dst: String = _
  private val sfDir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = graft.SparkUtil.configure(
      SparkSession.builder().master("local[4]"), "4").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    dst = java.nio.file.Files.createTempDirectory("graft-ddsketch").toString
    val sq = spark
    import sq.implicits._
    // 0.0 lands in the low store; 420.0 repeats 500× (a one-value bin where
    // est must equal exact); 1e-4..1e4 spans the grid; the rest are dense
    // deterministic pseudo-uniforms
    val vals =
      Seq.fill(25)(0.0) ++ Seq.fill(500)(420.0) ++
        Seq(1e-4, 1e-3, 1e-2, 1e-1, 1.0, 10.0, 100.0, 1e3, 1e4) ++
        (1 to 466).map(i => 0.5 + (i * 7919 % 1000) / 10.0)
    val types = Seq("a", "b", "c")
    vals.zipWithIndex.map { case (v, i) =>
      (i.toLong, types(i % types.length), v)
    }.toDF("event_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dst/events.parquet")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("q130: midpoint bound holds on zeros, constants, and 8 decades") {
    val rows = RelQueries.defs("q130_ddsketch_quantile")(spark, dst).collect()
    assert(rows.length == 3, rows.mkString("; "))
    rows.foreach { r =>
      val (q, est, exact, err, half, ok) =
        (r.getDouble(0), r.getDouble(1), r.getDouble(2),
          r.getDouble(3), r.getDouble(4), r.getInt(5))
      assert(ok == 1, s"bound_ok=0 at q=$q: |$est - $exact| = $err > $half")
      // log bins: half-spread ≤ vmin·(e^w − 1)/2 → ≈1% relative error
      if (exact > 0) assert(err <= exact * 0.011 + 1e-9,
        s"relative error at q=$q: $err vs exact $exact")
    }
    // the 500× constant puts the median in a one-value bin: est == exact
    val med = rows.find(_.getDouble(0) == 0.5).get
    assert(med.getDouble(1) == 420.0 && med.getDouble(2) == 420.0, med.toString)
  }

  test("q130 is deterministic across runs") {
    val a = RelQueries.defs("q130_ddsketch_quantile")(spark, dst)
      .collect().map(_.toString).sorted.toSeq
    val b = RelQueries.defs("q130_ddsketch_quantile")(spark, dst)
      .collect().map(_.toString).sorted.toSeq
    assert(a == b)
  }

  test("q131: per-shard sketches merge to the global sketch bit-identically") {
    for (dir <- Seq(dst, sfDir)) {
      val rows = RelQueries.defs("q131_ddsketch_merge")(spark, dir).collect()
      val byPart = rows.map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
      assert(byPart("merged") == byPart("global"),
        s"merge != direct build in $dir: ${byPart("merged")} vs ${byPart("global")}")
      // shard totals partition the corpus
      val shardTotal = byPart.collect {
        case (p, (_, total, _, _)) if p.startsWith("type:") => total }.sum
      assert(shardTotal == byPart("global")._2)
    }
  }

  test("q130 sketch dictionary stays bounded (the 100 TB contract)") {
    // ~8 decades at w=0.02 is ≲ ln(1e8)/0.02 + low store ≈ 922 bins; the
    // cum/rank stages only ever see this dictionary, never the data scale
    val sk = RelQueries.defs("q131_ddsketch_merge")(spark, dst)
      .where("part = 'global'").collect()
    assert(sk.head.getLong(1) <= 1000, s"bins: ${sk.head.getLong(1)}")
  }
}
