package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.{DedupQueries, QueryBase}

/** Equivalence pins for the r19 sketch size-sweep fuses: q232/q233/q234
  * replaced one-branch-per-geometry corpus passes with a single pass
  * keyed by the geometry. These tests re-run the PRE-FUSE branch shapes
  * verbatim (per-p register aggregation, per-w counter build, per-k
  * corpus-wide TakeOrdered) and require the fused production queries to
  * reproduce them bit-exactly — the oracle gate proves parity against
  * DuckDB, this proves the fuse itself introduced no drift and pins the
  * prefix/constant-embedding arguments the rewrite rests on. */
class SweepFuseSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val dir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = graft.SparkUtil.configure(
      SparkSession.builder().master("local[4]"), "4").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def shingles(): DataFrame =
    SparkUtil.table(spark, dir, "documents")
      .select(explode(graft.functions.TextFunctions.doc_shingles(
        col("text"), 3)).as("s"))

  private def sorted(df: DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq).toSeq.sortBy(_.mkString("|"))

  test("q234: bottom-k of the bottom-maxK prefix equals the direct bottom-k") {
    // duplicates forced (mod 977): under ties the prefix re-sort must
    // agree with a direct corpus-wide TakeOrdered on (k_actual, kth_min)
    val hashes = spark.range(5000)
      .select(pmod(col("id") * lit(2654435761L), lit(977L)).as("h"))
    val maxK = DedupQueries.KmvSweepKs.max
    val low = hashes.orderBy("h").limit(maxK).cache()
    try {
      for (k <- DedupQueries.KmvSweepKs) {
        val agg = (d: DataFrame) => d.orderBy("h").limit(k)
          .agg(count(lit(1)).as("k_actual"), max(col("h")).as("kth_min"))
          .collect()(0).toSeq
        assert(agg(hashes) == agg(low), s"prefix property broke at k=$k")
      }
    } finally low.unpersist()
  }

  test("q232: the fused register build equals the per-geometry branches") {
    val fused = sorted(DedupQueries.defs("q232_hll_sweep")(spark, dir))
    // the pre-fuse shape, verbatim: one register aggregation + one-row
    // rollup per p, constants as Scala-side literals
    import QueryBase.pround
    val sh = shingles()
    val exact = sh.agg(countDistinct(col("s")).as("exact_distinct"))
    val perP = DedupQueries.HllSweepPs.map { p =>
      val restBits = 60 - p
      val m = 1L << p
      val k = restBits + 1
      val h = conv(substring(md5(col("s")), 1, 15), 16, 10).cast("long")
      val rest = h.bitwiseAND(lit((1L << restBits) - 1))
      val rank = ((restBits - 2) to 0 by -1).foldLeft(
          when(rest >= lit(1L << (restBits - 1)), lit(1))) {
        case (acc, b) => acc.when(rest >= lit(1L << b), lit(restBits - b))
      }.otherwise(lit(restBits + 1))
      val regs = sh.select(shiftrightunsigned(h, restBits).as("bucket"), rank.as("rk"))
        .groupBy("bucket").agg(max("rk").as("r"))
      regs.agg(count(lit(1)).as("n_buckets"),
          sum(expr(s"shiftleft(cast(1 as bigint), $k - r)")).as("s_present"))
        .withColumn("v_zero", lit(m) - col("n_buckets"))
        .withColumn("s_total", col("s_present") + col("v_zero") * lit(1L << k))
        .withColumn("raw_est",
          pround(lit(DedupQueries.hllSweepAlphaC(p)) / col("s_total").cast("double"), 6))
        .withColumn("est",
          when(col("raw_est") <= lit(2.5 * m) && col("v_zero") > 0,
            pround(lit(m.toDouble) *
              pround(log(lit(m.toDouble) / col("v_zero")), 6), 6))
            .otherwise(col("raw_est")))
        .select(lit(p).as("p"), lit(m).as("m"), col("v_zero"), col("est"))
    }
    val old = sorted(perP.reduce(_ unionByName _)
      .crossJoin(broadcast(exact))
      .withColumn("rel_err",
        pround(abs(col("est") - col("exact_distinct")) /
          col("exact_distinct").cast("double"), 6)))
    assert(fused == old, "fused q232 != per-geometry branch build")
  }

  test("q233: the fused counter build equals the per-width branches") {
    val fused = sorted(DedupQueries.defs("q233_cms_sweep")(spark, dir))
    val ex = shingles()
    val top = ex.groupBy("s").agg(count(lit(1)).as("exact_df"))
      .orderBy(desc("exact_df"), col("s")).limit(10).cache()
    def ipCols(item: org.apache.spark.sql.Column, w: Long) = {
      val h1 = conv(substring(md5(item), 1, 15), 16, 10).cast("long")
      val h2 = conv(substring(md5(item), 16, 15), 16, 10).cast("long")
      array((0 until DedupQueries.CmsD).map(i =>
        struct(lit(i).as("i"),
          ((h1 + lit(i.toLong) * h2) % w).cast("int").as("p"))): _*)
    }
    val perW = DedupQueries.CmsSweepWs.map { w =>
      val counters = ex.select(explode(ipCols(col("s"), w)).as("ip"))
        .select(col("ip.i").as("i"), col("ip.p").as("p"))
        .groupBy("i", "p").agg(count(lit(1)).as("cnt"))
      top.select(col("s"), col("exact_df"), explode(ipCols(col("s"), w)).as("ip"))
        .select(col("s"), col("exact_df"), col("ip.i").as("i"), col("ip.p").as("p"))
        .join(broadcast(counters), Seq("i", "p"))
        .groupBy("s", "exact_df").agg(min("cnt").as("est_df"))
        .select(lit(w).as("w"), col("s"), col("exact_df"), col("est_df"),
          (col("est_df") - col("exact_df")).as("overcount"))
    }
    val old = sorted(perW.reduce(_ unionByName _))
    top.unpersist()
    assert(fused == old, "fused q233 != per-width branch build")
  }
}
