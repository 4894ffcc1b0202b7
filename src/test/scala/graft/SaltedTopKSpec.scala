package graft

import graft.queries.QueryBase
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** [[QueryBase.saltedTopK]]'s contract is BIT-IDENTITY to the direct
  * per-group rank window under a TOTAL order — the property every
  * migrated ANN/metric query leans on (the oracles replay the direct
  * window). Randomized frames exercise the shapes that could break it:
  * heavy ties in the ordering value (boundary rows spread across salts),
  * groups smaller than depth, skewed group sizes, a depth-1 cut, and
  * depth > group size. */
class SaltedTopKSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = graft.SparkUtil.configure(
      SparkSession.builder().master("local[4]"), "4").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** Deterministic pseudo-random frame: (grp, id, v) with v drawn from a
    * SMALL value domain so rank-boundary ties are common. */
  private def frame(seed: Long, rows: Int, groups: Int, vDomain: Int) = {
    val ss = spark; import ss.implicits._
    val rnd = new scala.util.Random(seed)
    // skew: group 0 gets an extra share of rows
    (0 until rows).map { i =>
      val g = if (rnd.nextInt(4) == 0) 0L else rnd.nextInt(groups).toLong
      (g, i.toLong, rnd.nextInt(vDomain).toLong)
    }.toDF("grp", "id", "v").repartition(7)
  }

  private def direct(df: org.apache.spark.sql.DataFrame, depth: Int) = {
    val w = Window.partitionBy("grp").orderBy(desc("v"), col("id"))
    df.withColumn("rnk", row_number().over(w)).where(col("rnk") <= depth)
      .select("grp", "id", "v", "rnk")
      .collect().map(_.toString).toSet
  }

  private def salted(df: org.apache.spark.sql.DataFrame, depth: Int) =
    QueryBase.saltedTopK(df, Seq("grp"), Seq(desc("v"), col("id")),
        col("id"), depth, "rnk")
      .select("grp", "id", "v", "rnk")
      .collect().map(_.toString).toSet

  test("salted == direct on randomized tie-heavy skewed frames") {
    for ((seed, rows, groups, vDom, depth) <- Seq(
        (1L, 2000, 5, 7, 5),      // heavy ties, few groups
        (2L, 3000, 40, 3, 10),    // extreme ties (3 values), many groups
        (3L, 500, 3, 1000, 1),    // depth-1 (the q215 truth shape)
        (4L, 800, 200, 9, 5),     // groups smaller than depth
        (5L, 1500, 2, 5, 50))) {  // depth 50 (the q116 RerankC shape)
      val df = frame(seed, rows, groups, vDom)
      assert(salted(df, depth) == direct(df, depth),
        s"salted != direct for seed=$seed depth=$depth")
    }
  }

  test("depth beyond every group keeps all rows with exact ranks") {
    val df = frame(6L, 300, 10, 4)
    assert(salted(df, 1000) == direct(df, 1000))
  }
}
