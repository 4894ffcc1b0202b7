package graft

import graft.queries.QueryBase
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** `QueryBase.stitchedRowNumber` / `ntileOf` must be bit-identical to the
  * single-window `row_number().over` / `ntile().over` they replace in
  * q197/q202 — on randomized keys with heavy exact ties, negative keys
  * (the DESC-order negation path), and totals that don't divide the tile
  * count. */
class StitchedRankSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = graft.SparkUtil.configure(
      SparkSession.builder().master("local[4]"), "4").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("stitched rank == window row_number on ties, negatives, skew") {
    val ss = spark; import ss.implicits._
    val rng = new scala.util.Random(7)
    // heavy ties (key 0 repeats ~25%), negative keys, wide range so the
    // 16-wide stitch makes many buckets
    val rows = (1L to 997L).map { id =>
      val k = rng.nextInt(4) match {
        case 0 => 0L
        case 1 => rng.nextInt(40).toLong - 20L
        case _ => rng.nextInt(100000).toLong - 50000L
      }
      (id, k)
    }
    val df = rows.toDF("uid", "k").repartition(8)
    val (got, tot) = QueryBase.stitchedRowNumber(
      df, col("k"), col("uid"), 16L, "spec:rank", "rn")
    assert(tot == 997L)
    val want = df.withColumn("rn_w",
      row_number().over(Window.orderBy(col("k"), col("uid"))).cast("long"))
    val mismatches = got.join(want, Seq("uid"))
      .where(col("rn") =!= col("rn_w")).count()
    assert(mismatches == 0L)

    // ntileOf == ntile().over for a k that doesn't divide the total
    for (k <- Seq(4, 10)) {
      val gotTiles = got.withColumn("t", QueryBase.ntileOf("rn", tot, k))
      val wantTiles = want.withColumn("t_w",
        ntile(k).over(Window.orderBy(col("k"), col("uid"))))
      val bad = gotTiles.join(wantTiles, Seq("uid"))
        .where(col("t") =!= col("t_w")).count()
      assert(bad == 0L, s"ntile($k) drifted")
    }
  }

  test("a width too narrow for the key domain fails loudly, before collecting") {
    val ss = spark; import ss.implicits._
    // 64 distinct keys spread 1e9 apart: width 1 puts each in its own
    // bucket, breaching a maxBuckets of 16 — the guard must name the
    // width contract instead of collecting the bucket frame
    val df = (0L until 64L).map(i => (i, i * 1000000000L)).toDF("uid", "k")
    val ex = intercept[IllegalArgumentException] {
      QueryBase.stitchedRowNumber(
        df, col("k"), col("uid"), 1L, "spec:guard", "rn", maxBuckets = 16L)
    }
    assert(ex.getMessage.contains("width=1"), ex.getMessage)
    assert(ex.getMessage.contains("key domain"), ex.getMessage)
  }

  test("ntileOf edge: fewer rows than tiles numbers them 1..n") {
    val ss = spark; import ss.implicits._
    val df = Seq((1L, 5L), (2L, 3L), (3L, 9L)).toDF("uid", "k")
    val (got, tot) = QueryBase.stitchedRowNumber(
      df, col("k"), col("uid"), 4096L, "spec:edge", "rn")
    assert(tot == 3L)
    val tiles = got.withColumn("t", QueryBase.ntileOf("rn", tot, 10))
      .select("uid", "t").as[(Long, Int)].collect().toMap
    assert(tiles == Map(2L -> 1, 1L -> 2, 3L -> 3))
  }
}
