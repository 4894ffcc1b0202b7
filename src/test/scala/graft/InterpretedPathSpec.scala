package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The native expressions must produce identical results through the
  * interpreted eval path (codegen disabled) — type-coercion bugs hide
  * there because generated Java silently widens primitives where
  * `asInstanceOf` throws. */
class InterpretedPathSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = graft.SparkUtil.configure(
        SparkSession.builder().master("local[4]"), "4")
      .config("spark.sql.codegen.wholeStage", "false")
      .config("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("SAX queries run and agree with goldens under NO_CODEGEN") {
    val dir = "/root/testdata/sf0.001"
    // windowed encode: histogram top entry matches the known fixture value
    val words = SparkEntry.queries("q02_sax_window_encode")(spark, dir)
    val top = words.groupBy("word").count()
      .orderBy(org.apache.spark.sql.functions.desc("count"),
        org.apache.spark.sql.functions.asc("word"))
      .head()
    assert(top.getString(0) == "BDBB" && top.getLong(1) == 47L, top)
    // mindist via the struct expression (int literals coerced, not CCE)
    val md = SparkEntry.queries("q04_sax_mindist")(spark, dir)
    assert(md.count() == 1000)
    // SQL registration path
    graft.sax.SaxFunctions.register(spark)
    val r = spark.sql(
      "SELECT sax_encode(array(1.0D, 2.0D, 3.0D, 10.1D), 2, 4) AS w").head()
    assert(r.getString(0) == "AD")
  }

  test("vector expressions agree with a driver-side loop under NO_CODEGEN") {
    val dir = "/root/testdata/sf0.001"
    val rows = spark.read.parquet(s"$dir/embeddings.parquet")
      .where(org.apache.spark.sql.functions.col("vec_id") < 3)
      .select(org.apache.spark.sql.functions.col("vec_id"),
        org.apache.spark.sql.functions.col("embedding"),
        graft.functions.VectorFunctions.vec_l2norm(
          org.apache.spark.sql.functions.col("embedding")).as("nrm"))
      .collect()
    for (r <- rows) {
      val e = r.getSeq[Float](1)
      var s = 0.0; e.foreach(x => s += x.toDouble * x.toDouble)
      assert(r.getDouble(2) == math.sqrt(s), s"norm of vec ${r.getLong(0)}")
    }
    // cosine through the SQL registration (GraftExtensions) — interpreted
    val c = spark.sql(
      """SELECT vec_cosine(CAST(array(1.0, 2.0, 2.0) AS ARRAY<FLOAT>),
        |                  CAST(array(2.0, 4.0, 4.0) AS ARRAY<FLOAT>)) AS c""".stripMargin).head()
    assert(math.abs(c.getDouble(0) - 1.0) < 1e-15)
    // ANN brute query end-to-end on the interpreted path
    assert(SparkEntry.queries("q40_ann_brute")(spark, dir).count() > 0)
  }
}
