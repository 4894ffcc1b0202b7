package graft

import graft.sax.SaxFunctions._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The at-rest half of the iSAX scale story: word-bucketed storage makes
  * word equi-joins shuffle-free. This spec proves the plan shape —
  * bucketed self-join has NO Exchange on either side — and that results
  * match the unbucketed join. */
class SaxBucketingSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var warehouse: java.nio.file.Path = _

  override def beforeAll(): Unit = {
    warehouse = java.nio.file.Files.createTempDirectory("graft-warehouse")
    spark = graft.SparkUtil.configure(
        SparkSession.builder().master("local[4]"), "4")
      .config("spark.sql.warehouse.dir", warehouse.toString)
      .config("spark.sql.autoBroadcastJoinThreshold", -1) // force SMJ to expose Exchanges
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("word-bucketed tables join co-located: no Exchange in the plan") {
    import org.apache.spark.sql.expressions.Window
    val trail = Window.partitionBy("user_id")
      .orderBy(expr("ts div 1000"), col("event_id")).rowsBetween(-7, 0)
    val words = spark.read
      .parquet("/root/testdata/sf0.001/events.parquet")
      .select(col("event_id"), col("user_id"),
        sax_encode_window(collect_list(col("value")).over(trail), 8, 4, 4).as("word"))

    words.write.mode("overwrite").bucketBy(8, "word").sortBy("word")
      .saveAsTable("words_bucketed")

    val t = spark.table("words_bucketed")
    val joined = t.as("a").join(t.as("b"),
      col("a.word") === col("b.word") && col("a.event_id") < col("b.event_id"))

    val physical = joined.queryExecution.executedPlan.toString
    assert(physical.contains("SortMergeJoin"), physical)
    assert(!physical.contains("Exchange hashpartitioning"),
      s"bucketed join should not shuffle:\n$physical")

    // same result as the unbucketed join
    val unbucketed = words.as("a").join(words.as("b"),
      col("a.word") === col("b.word") && col("a.event_id") < col("b.event_id"))
    assert(joined.count() == unbucketed.count())
  }

  test("q78's served join reads both bucketed sides with no Exchange") {
    val df = graft.queries.SaxQueries
      .defs("q78_bucketed_word_join")(spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("Exchange"), s"q78 join must not shuffle:\n$plan")
    assert(df.count() > 0)
  }

  test("q92 adaptive index: iSAX nesting holds per window, cells partition the corpus") {
    import org.apache.spark.sql.expressions.Window
    val dir = "/root/testdata/sf0.001"
    val trail = Window.partitionBy("user_id")
      .orderBy(expr("ts div 1000"), col("event_id")).rowsBetween(-7, 0)
    // the nesting property the split RELIES on: every c=4 first symbol
    // refines its window's c=2 first symbol (0.0 is a breakpoint of both)
    val dual = spark.read.parquet(s"$dir/events.parquet")
      .select(sax_encode_window(collect_list(col("value")).over(trail), 8, 4, 2).as("cw"),
              sax_encode_window(collect_list(col("value")).over(trail), 8, 4, 4).as("fw"))
      .select(substring(col("cw"), 1, 1).as("c2"), substring(col("fw"), 1, 1).as("c4"))
      .collect()
    val refines = Map('A' -> Set('A', 'B'), 'B' -> Set('C', 'D'), '#' -> Set('#'))
    for (r <- dual)
      assert(refines(r.getString(0).head)(r.getString(1).head), s"$r breaks nesting")
    val nWindows = dual.length.toLong

    val cells = graft.queries.SaxQueries
      .defs("q92_isax_adaptive_index")(spark, dir).collect()
    // the index manifest partitions the corpus exactly
    assert(cells.map(_.getAs[Long]("n_windows")).sum == nWindows)
    // split and unsplit cells are mutually exclusive per parent: a split
    // parent has only promoted children, an unsplit one only the '*' cell
    for ((_, rows) <- cells.groupBy(_.getAs[String]("parent_word"))) {
      val syms = rows.map(_.getAs[String]("promoted_sym")).toSet
      val depths = rows.map(_.getAs[Int]("depth")).toSet
      if (syms.contains("*")) assert(syms == Set("*") && depths == Set(0), rows.toSeq)
      else {
        assert(depths == Set(1), rows.toSeq)
        // promoted children carry >1 distinct refined symbol or the parent
        // had a single dominant fine symbol — either way all are c=4 chars
        assert(syms.forall(s => s.length == 1 && "ABCD#".contains(s)), syms)
      }
    }
    // the threshold really split something at this scale and left the
    // long tail unsplit (both regimes exercised)
    assert(cells.exists(_.getAs[Int]("depth") == 1), "no bucket split")
    assert(cells.exists(_.getAs[Int]("depth") == 0), "everything split")
  }
}
