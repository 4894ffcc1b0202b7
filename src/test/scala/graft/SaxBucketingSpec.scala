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
    val evDf = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val trail = Window.partitionBy("user_id")
      .orderBy(graft.queries.QueryBase.tsUs(evDf), col("event_id")).rowsBetween(-7, 0)
    val words = evDf
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
    val evDf = spark.read.parquet(s"$dir/events.parquet")
    val trail = Window.partitionBy("user_id")
      .orderBy(graft.queries.QueryBase.tsUs(evDf), col("event_id")).rowsBetween(-7, 0)
    // the nesting property the split RELIES on, at BOTH promotion levels:
    // every c=4 first symbol refines its window's c=2 first symbol (0.0
    // is a breakpoint of both), and every c=8 first symbol refines its
    // c=4 symbol (the quartile breakpoints are octile breakpoints)
    val tri = spark.read.parquet(s"$dir/events.parquet")
      .select(sax_encode_window(collect_list(col("value")).over(trail), 8, 4, 2).as("cw"),
              sax_encode_window(collect_list(col("value")).over(trail), 8, 4, 4).as("fw"),
              sax_encode_window(collect_list(col("value")).over(trail), 8, 4, 8).as("ew"))
      .select(substring(col("cw"), 1, 1).as("c2"), substring(col("fw"), 1, 1).as("c4"),
              substring(col("ew"), 1, 1).as("c8"))
      .collect()
    val refines = Map('A' -> Set('A', 'B'), 'B' -> Set('C', 'D'), '#' -> Set('#'))
    val refines8 = Map('A' -> Set('A', 'B'), 'B' -> Set('C', 'D'),
      'C' -> Set('E', 'F'), 'D' -> Set('G', 'H'), '#' -> Set('#'))
    for (r <- tri) {
      assert(refines(r.getString(0).head)(r.getString(1).head), s"$r breaks c2->c4 nesting")
      assert(refines8(r.getString(1).head)(r.getString(2).head), s"$r breaks c4->c8 nesting")
    }
    val nWindows = tri.length.toLong

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
        assert(depths.subsetOf(Set(1, 2)), rows.toSeq)
        // promoted children carry >1 distinct refined symbol or the parent
        // had a single dominant fine symbol — either way all are c=4 chars
        assert(syms.forall(s => s.length == 1 && "ABCD#".contains(s)), syms)
        // recursion is per level-1 CELL: depth-2 rows carry a c=8 symbol,
        // depth-1 rows carry '*', and the two never mix within one cell
        for (r <- rows) {
          val s2 = r.getAs[String]("promoted_sym2")
          if (r.getAs[Int]("depth") == 2)
            assert(s2.length == 1 && "ABCDEFGH#".contains(s2), r.toSeq)
          else assert(s2 == "*", r.toSeq)
        }
      }
    }
    // the threshold really split something at this scale and left the
    // long tail unsplit (both regimes exercised)
    assert(cells.exists(_.getAs[Int]("depth") == 1), "no bucket split")
    assert(cells.exists(_.getAs[Int]("depth") == 0), "everything split")
  }

  test("q92 recursion fires at sf0.01: depth-2 cells exist and refine their parents") {
    val cells = graft.queries.SaxQueries
      .defs("q92_isax_adaptive_index")(spark, "/root/testdata/sf0.01").collect()
    val d2 = cells.filter(_.getAs[Int]("depth") == 2)
    assert(d2.nonEmpty, "the level-2 promotion never fired at sf0.01")
    val refines8 = Map("A" -> Set("A", "B"), "B" -> Set("C", "D"),
      "C" -> Set("E", "F"), "D" -> Set("G", "H"), "#" -> Set("#"))
    for (r <- d2)
      assert(refines8(r.getAs[String]("promoted_sym"))(r.getAs[String]("promoted_sym2")),
        s"depth-2 cell does not refine its level-1 symbol: ${r.toSeq}")
    // every depth coexists in the manifest at this scale
    assert(Set(0, 1, 2).subsetOf(cells.map(_.getAs[Int]("depth")).toSet))
  }
}
