package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Statistics-driven planning — the remaining leg of the Catalyst
  * cooperation story beside AQE (q142), DPP (q135), runtime blooms
  * (q139) and bucketing (q137): at-rest tables carry ANALYZE'd catalog
  * statistics, and with CBO enabled the optimizer REORDERS a
  * syntactically-bad join chain so the selective dimension joins the
  * fact first. At 100 TB this is the difference between shipping the
  * full fact⋈dimA intermediate into the selective join and cutting the
  * fact down first — the optimizer decision column stats exist to
  * enable. The reorder must not change values (row-equality pinned). */
class CboReorderSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = graft.SparkUtil.configure(
      SparkSession.builder().master("local[4]"), "4").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base = java.nio.file.Files.createTempDirectory("graft-cbo-").toString
    // a fact and two dims, sized so the SYNTACTIC order (fact ⋈ dimA
    // first) is the wrong one: dimB's b_attr filter keeps ~10% of keys
    spark.range(20000)
      .select(col("id").as("fk_a"), (col("id") % 100).as("fk_b"),
        (col("id") * 3).as("v"))
      .write.mode("overwrite").option("path", s"$base/fact")
      .saveAsTable("graft_cbo_fact")
    spark.range(2000).select(col("id").as("a_key"), (col("id") % 7).as("a_attr"))
      .write.mode("overwrite").option("path", s"$base/dima")
      .saveAsTable("graft_cbo_dima")
    spark.range(100).select(col("id").as("b_key"), (col("id") % 10).as("b_attr"))
      .write.mode("overwrite").option("path", s"$base/dimb")
      .saveAsTable("graft_cbo_dimb")
    for (t <- Seq("graft_cbo_fact", "graft_cbo_dima", "graft_cbo_dimb"))
      spark.sql(s"ANALYZE TABLE $t COMPUTE STATISTICS FOR ALL COLUMNS")
  }

  override def afterAll(): Unit = {
    if (spark != null) {
      for (t <- Seq("graft_cbo_fact", "graft_cbo_dima", "graft_cbo_dimb"))
        spark.sql(s"DROP TABLE IF EXISTS $t")
      spark.stop()
    }
  }

  /** The chain written dim-A-first — the order a naive author types. */
  private def chain(s: SparkSession): DataFrame = {
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // shuffle joins: order is the cost
    s.table("graft_cbo_fact")
      .join(s.table("graft_cbo_dima"), col("fk_a") === col("a_key"))
      .join(s.table("graft_cbo_dimb").where(col("b_attr") === 3),
        col("fk_b") === col("b_key"))
      .groupBy("a_attr").agg(sum("v").as("sv"))
  }

  test("column statistics let CBO join the selective dim first") {
    val off = spark.newSession()
    off.conf.set("spark.sql.cbo.enabled", "false")
    val offPlan = chain(off).queryExecution.optimizedPlan.treeString
    // syntactic order survives: dimA is the inner (first) join partner
    assert(offPlan.indexOf("dima") < offPlan.indexOf("dimb"),
      s"expected the authored dimA-first order without CBO:\n$offPlan")

    val on = spark.newSession()
    on.conf.set("spark.sql.cbo.enabled", "true")
    on.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
    val onDf = chain(on)
    val onPlan = onDf.queryExecution.optimizedPlan.treeString
    // the stats-derived order: the b_attr-filtered dimB joins the fact
    // FIRST, so the dimA join consumes the already-reduced intermediate
    assert(onPlan.indexOf("dimb") < onPlan.indexOf("dima"),
      s"CBO did not reorder the selective dim first:\n$onPlan")

    // the reorder is plan-only: both sessions return identical rows
    val offRows = chain(off).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val onRows = onDf.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(offRows == onRows && offRows.nonEmpty,
      s"reorder changed values: ${offRows.size} vs ${onRows.size} rows")

    // conf isolation: the shared session keeps its defaults
    assert(spark.conf.get("spark.sql.cbo.enabled") == "false",
      "CBO conf leaked into the parent session")
  }
}
