package graft

import graft.streaming.StreamingStateErasure
import graft.streaming.StreamingStateErasure.{ExemptState, ForgettingLeg}
import org.scalatest.funsuite.AnyFunSuite

/** Structural guard for live-state forgetting (the [[EstateCoverageSpec]]
  * idiom applied to GroupState instead of at-rest files): the r17 verdict's
  * #4 demanded that EVERY stateful streaming module forget an erased
  * user, and a hand-enumerated legs list would silently rot the moment a
  * round adds a new `flatMapGroupsWithState` module. This spec scans the
  * streaming sources for stateful operators and asserts
  * [[StreamingStateErasure.stateCoverage]] classifies each module as a
  * forgetting leg (whose entry point must exist AND must compose the
  * module's extracted update body — not a re-derived copy) or as an
  * explicit exemption with a stated reason that is also documented in the
  * wrapper's scaladoc. Adding an unclassified stateful module reddens
  * `sbt test`. Needs no SparkSession.
  */
class StateErasureCoverageSpec extends AnyFunSuite {

  private val streamingDir = java.nio.file.Paths.get("src/main/scala/graft/streaming")

  private lazy val moduleSources: Map[String, String] = {
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.list(streamingDir).iterator().asScala
      .filter(_.toString.endsWith(".scala"))
      .map { p =>
        val name = p.getFileName.toString.stripSuffix(".scala")
        name -> new String(java.nio.file.Files.readAllBytes(p),
          java.nio.charset.StandardCharsets.UTF_8)
      }.toMap
  }

  /** Modules retaining cross-batch per-key state: the GroupState APIs or
    * Spark's built-in dedup state store. The wrapper itself is excluded —
    * it is the forgetting mechanism, not a business module. */
  private lazy val statefulModules: Set[String] =
    moduleSources.collect {
      case (name, src)
        if name != "StreamingStateErasure" &&
          ("flatMapGroupsWithState|mapGroupsWithState|dropDuplicates".r
            .findFirstIn(src).isDefined) => name
    }.toSet

  private lazy val wrapperSrc = moduleSources("StreamingStateErasure")

  test("every stateful streaming module is classified (forgetting leg or exempt)") {
    val missing = statefulModules -- StreamingStateErasure.stateCoverage.keySet
    assert(missing.isEmpty,
      s"stateful streaming modules with no forgetting classification: " +
        s"${missing.toSeq.sorted.mkString(", ")} — add a ForgettingLeg to " +
        "StreamingStateErasure (wire the module's extracted update body " +
        "through the forgetting wrapper + a StreamingStateErasureSpec proof) " +
        "or an ExemptState with the reason")
  }

  test("no stale coverage entries (every classified module is a real stateful module)") {
    val stale = StreamingStateErasure.stateCoverage.keySet -- statefulModules
    assert(stale.isEmpty,
      s"coverage entries for modules that are no longer stateful: " +
        s"${stale.toSeq.sorted.mkString(", ")}")
  }

  test("each forgetting leg exists and composes the module's extracted update body") {
    val methods = StreamingStateErasure.getClass.getMethods.map(_.getName).toSet
    StreamingStateErasure.stateCoverage.foreach {
      case (module, ForgettingLeg(leg, body)) =>
        assert(methods.contains(leg),
          s"$module: declared leg $leg is not a method on StreamingStateErasure")
        // the leg must hand the module's own update function to the
        // wrapper — a copy of the state algebra would drift silently
        assert(wrapperSrc.contains(body),
          s"$module: StreamingStateErasure never references $body — the leg " +
            "must compose the extracted update body, not re-derive it")
        assert(moduleSources(module).contains(body.split('.').last),
          s"$module: extracted update body ${body.split('.').last} not found " +
            "in the module source")
      case _ => ()
    }
  }

  test("each exemption has a substantive reason, documented in the wrapper's scaladoc") {
    StreamingStateErasure.stateCoverage.foreach {
      case (module, ExemptState(reason)) =>
        assert(reason.length > 40,
          s"$module: exemption reason too thin to audit: '$reason'")
        assert(wrapperSrc.contains(s"[[$module]]"),
          s"$module: exempt but never mentioned in StreamingStateErasure's " +
            "scaladoc — the exemption must be visible where a reader looks")
      case _ => ()
    }
  }

  test("every leg has a proof in StreamingStateErasureSpec") {
    val specSrc = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("src/test/scala/graft/StreamingStateErasureSpec.scala")),
      java.nio.charset.StandardCharsets.UTF_8)
    StreamingStateErasure.stateCoverage.foreach {
      case (module, ForgettingLeg(leg, _)) =>
        assert(specSrc.contains(leg),
          s"$module: leg $leg has no reference in StreamingStateErasureSpec — " +
            "every leg needs a replay proof")
      case _ => ()
    }
  }
}
