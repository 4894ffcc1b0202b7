package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The bench's cold-start attribution (the r17 verdict's #3): every
  * [[graft.queries.AtRestTables]] build records EXCLUSIVE seconds under
  * its key prefix, nested prerequisite builds subtracted — so the
  * `builds` map in BENCH_FULL.json sums to the bootstrap cost without
  * double-counting the q161-on-q134 style nesting. */
class BuildSecondsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = graft.SparkUtil.configure(
      SparkSession.builder().master("local[2]"), "2").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("build seconds are recorded per key prefix, exclusive of nested builds") {
    import graft.queries.AtRestTables
    AtRestTables.resetBuildSeconds()
    AtRestTables.get(spark, "bsouter|spec") { _ =>
      // the nested prerequisite (the q161-builds-on-q134 shape)
      AtRestTables.get(spark, "bsinner|spec") { _ =>
        Thread.sleep(120); Seq.empty
      }
      Thread.sleep(60)
      Seq.empty
    }
    val bs = AtRestTables.buildSeconds
    assert(bs.keySet == Set("bsouter", "bsinner"), s"prefixes: ${bs.keySet}")
    assert(bs("bsinner") >= 0.1, s"inner self-time lost: ${bs("bsinner")}")
    // EXCLUSIVE: the outer's recorded time must not include the inner's
    // 120 ms — with inclusive timing it would be >= 0.18
    assert(bs("bsouter") >= 0.05 && bs("bsouter") < 0.12,
      s"outer time not exclusive: ${bs("bsouter")}")
    // a memoized re-entry records nothing
    AtRestTables.get(spark, "bsouter|spec")(_ => Seq.empty)
    assert(AtRestTables.buildSeconds == bs, "memo hit changed build times")
    AtRestTables.resetBuildSeconds()
    assert(AtRestTables.buildSeconds.isEmpty)
  }
}
