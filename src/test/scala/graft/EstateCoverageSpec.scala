package graft

import org.scalatest.funsuite.AnyFunSuite

/** Structural guard for estate governance (the r17 verdict's #2, the
  * [[OracleParitySpec]] idiom applied to the at-rest lifecycle): q311's
  * estate ledger is only as complete as its enumeration, and r17 shipped
  * 21 hand-listed classes while [[graft.queries.AtRestTables]] carried 28
  * lifecycle keys — nothing failed when an at-rest artifact escaped the
  * census. This spec scans `src/main` for every
  * `AtRestTables.get/getPath(spark, s"<prefix>|…")` registration and
  * asserts [[graft.queries.EstateCoverage]] maps each key to declared
  * ledger classes (validated against the q311/q314 inventories) or to an
  * explicit exemption with a stated reason. Adding a new at-rest key
  * without classifying it reddens `sbt test`. Needs no SparkSession.
  */
class EstateCoverageSpec extends AnyFunSuite {
  import graft.queries.EstateCoverage
  import graft.queries.EstateCoverage.{Audited, Exempt}
  import graft.queries.TextQueries.{EstateLedgerClasses, RemediatedEstateClasses}

  /** Every at-rest key prefix registered anywhere in src/main — the
    * ground truth the coverage map is checked against. The key shape is
    * itself a convention this scan enforces: a registration whose key is
    * not an s"<prefix>|…" literal would escape the scan, so a second
    * pattern counts ALL registrations and the two counts must agree. */
  private def srcFiles: Seq[java.nio.file.Path] = {
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(java.nio.file.Paths.get("src/main/scala"))
      .iterator().asScala.filter(_.toString.endsWith(".scala")).toSeq
  }

  private lazy val sources: Seq[String] =
    srcFiles.map(p => new String(java.nio.file.Files.readAllBytes(p),
      java.nio.charset.StandardCharsets.UTF_8))

  private val KeyedCall =
    """AtRestTables\.get(?:Path)?\(spark,\s*s"([A-Za-z0-9]+)\|""".r
  private val AnyCall = """AtRestTables\.get(?:Path)?\(""".r

  private lazy val registeredPrefixes: Set[String] =
    sources.flatMap(s => KeyedCall.findAllMatchIn(s).map(_.group(1))).toSet

  test("every AtRestTables registration uses the scannable s\"<prefix>|dir\" key shape") {
    val keyed = sources.map(s => KeyedCall.findAllMatchIn(s).size).sum
    val all = sources.map(s => AnyCall.findAllMatchIn(s).size).sum
    // AtRestTables.scala itself defines get/getPath (matching the call
    // pattern zero times — the definitions aren't calls), so the counts
    // compare call sites only
    assert(keyed == all,
      s"$all AtRestTables registrations but only $keyed use the " +
        "s\"<prefix>|…\" key literal this spec can scan — rewrite the " +
        "others or extend the scan")
  }

  test("every registered at-rest key is classified (audited or exempt)") {
    val missing = registeredPrefixes -- EstateCoverage.coverage.keySet
    assert(missing.isEmpty,
      s"at-rest keys with no governance classification: " +
        s"${missing.toSeq.sorted.mkString(", ")} — add a q311 ledger class " +
        "(EstateLedgerClasses + estateMeasures + the oracle row) or an " +
        "explicit EstateCoverage.Exempt with the reason")
  }

  test("no stale coverage entries (every classified key is actually registered)") {
    val stale = EstateCoverage.coverage.keySet -- registeredPrefixes
    assert(stale.isEmpty,
      s"coverage entries for keys no longer registered: " +
        s"${stale.toSeq.sorted.mkString(", ")}")
  }

  test("audited classes exist in the named query's declared inventory") {
    val inventories = Map(
      "q311" -> EstateLedgerClasses.map(_._1).toSet,
      "q314" -> RemediatedEstateClasses.toSet,
      "q315" -> graft.queries.RelQueries.UserEstateRemediationClasses.toSet,
      "q317" -> graft.queries.TextQueries.DocEstateRemediationClasses.toSet)
    EstateCoverage.coverage.foreach {
      case (key, Audited(q, classes)) =>
        assert(inventories.contains(q),
          s"$key audited by unknown query $q")
        assert(classes.nonEmpty, s"$key: Audited with no classes")
        val bad = classes.toSet -- inventories(q)
        assert(bad.isEmpty,
          s"$key names classes $q does not declare: ${bad.toSeq.sorted.mkString(", ")}")
      case (key, Exempt(reason)) =>
        assert(reason.trim.length >= 40,
          s"$key: exemption reason too thin to audit ('$reason')")
    }
  }

  test("every q311 ledger class is reachable from some at-rest key or is corpus-derived") {
    // classes that measure raw-corpus state rather than one key's tables
    // (none today — every ledger class measures a registered artifact)
    val orphan = EstateLedgerClasses.map(_._1).toSet --
      EstateCoverage.coverage.values.collect {
        case Audited("q311", cs) => cs
      }.flatten.toSet
    assert(orphan.isEmpty,
      s"q311 classes no at-rest key claims: ${orphan.toSeq.sorted.mkString(", ")}")
  }

  test("the ledger inventory itself is well-formed (unique labels, named policies)") {
    val labels = EstateLedgerClasses.map(_._1)
    assert(labels.distinct == labels, "duplicate ledger labels")
    val policies = Set("tombstone_mor", "compacted_cow", "retrained_forget",
      "compact_on_purge", "rewrite_on_purge", "recluster_on_purge",
      "partition_rewrite", "cdc_delete", "decrement",
      "snapshot_expiry_horizon", "rebuild_from_retained", "retire_on_swap",
      "retire_after_compaction")
    val bad = EstateLedgerClasses.filterNot(c => policies.contains(c._2))
    assert(bad.isEmpty, s"classes with undeclared policies: $bad")
  }
}
