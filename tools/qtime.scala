// Timing + plan-capture harness for the optimization rounds.
// Drive with: /opt/spark/bin/spark-shell --master local[$CPUS] \
//   --conf ... --jars target/scala-2.13/symtseriesspark_2.13-0.1.0.jar \
//   -I tools/qtime.scala
// Env: QT_QUERIES=q144,q140 (comma list or "slowest" or "all"),
//      QT_PASSES=3, QT_SF=/root/testdata/sf0.1, QT_PLANDIR= (optional:
//      write explain("formatted") per query), QT_TAG=before|after
// Emits one line per query: QT <name> <min> <all passes> and a final
// QT_TOTAL line. Methodology matches graft.Bench: untimed warm pass,
// then min-of-N timed passes, caches + memo cleared before every pass.
import org.apache.spark.sql.DataFrame

val sfDir = sys.env.getOrElse("QT_SF", "/root/testdata/sf0.1")
val passes = sys.env.getOrElse("QT_PASSES", "3").toInt
val planDir = sys.env.get("QT_PLANDIR")
val tag = sys.env.getOrElse("QT_TAG", "before")
val qsel = sys.env.getOrElse("QT_QUERIES", "all")

spark.sparkContext.setLogLevel("WARN")

def force(df: DataFrame): Long = df.queryExecution.toRdd.count()

val all = graft.SparkEntry.queries
val names: Seq[String] = qsel match {
  case "all" => all.keys.toSeq.sorted
  case s => s.split(",").map(_.trim).filter(_.nonEmpty).toSeq.map { q =>
    all.keys.find(k => k == q || k.startsWith(q + "_")).getOrElse(
      sys.error(s"no query named $q"))
  }
}

planDir.foreach(d => new java.io.File(d).mkdirs())

val results = scala.collection.mutable.LinkedHashMap[String, Double]()
for (pass <- 0 to passes; name <- names) {
  graft.queries.DedupQueries.invalidateComponentMemo()
  spark.catalog.clearCache()
  spark.sparkContext.setJobDescription(s"$name pass $pass")
  val t0 = System.nanoTime()
  val ok = try { force(all(name)(spark, sfDir)); true }
  catch { case scala.util.control.NonFatal(e) =>
    if (pass == 0) println(s"QT_ERR $name: ${e.getMessage.linesIterator.take(3).mkString(" | ")}")
    false }
  val dt = (System.nanoTime() - t0) / 1e9
  if (pass >= 1 && ok) {
    val cur = results.getOrElse(name, Double.MaxValue)
    results(name) = math.min(cur, dt)
    println(f"QT_PASS $name pass=$pass $dt%.3f")
  }
}
for ((name, t) <- results) println(f"QT $name $t%.3f")
println(f"QT_TOTAL ${results.values.sum}%.3f n=${results.size}")

// plan capture (outside timing)
planDir.foreach { d =>
  for (name <- names) {
    try {
      val df = all(name)(spark, sfDir)
      val p = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$d/${name.split("_").head}_$tag.txt"), p)
    } catch { case scala.util.control.NonFatal(e) =>
      println(s"QT_PLAN_ERR $name: ${e.getMessage}") }
  }
}
System.exit(0)
