package graft.spark

import graft.sax.{Sax, SaxMindistExpr, Tables}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** iSAX-style pruning for pattern-threshold searches — the one
  * reference-motivated optimization Catalyst cannot infer (SURVEY.md §4):
  *
  * `sax_mindist(word, n, 'PATTERN', 0, c).dist <= τ` implies, for EVERY
  * word position i, that the single-position lower bound already fits:
  * (n/w) * cell(word[i], pattern[i])² <= τ². Positions where some symbols
  * violate that get an injected `substring(word, i+1, 1) IN (allowed)`
  * conjunct — a plain string predicate that existing rules push toward the
  * scan (and, on a word-bucketed layout, into partition pruning), so
  * non-candidate words never reach the mindist evaluation.
  *
  * Soundness: dist = comp·sqrt(Σ cell²) >= comp·|cell_i| for any i, so
  * dropping rows with comp²·cell_i² > τ² can never drop a true match. The
  * portable-rounding wrapper floor(dist*10^d+0.5)/10^d <= τ admits dist up
  * to τ + 0.5/10^d; the allowed-set threshold adds that margin.
  */
object MindistPruneRule extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val conjuncts = splitConjuncts(cond)
      val extra = conjuncts.flatMap(prefilterFor).filterNot(conjuncts.contains)
      if (extra.isEmpty) f
      else Filter((conjuncts ++ extra).reduce(And), child)
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other     => Seq(other)
  }

  /** Recognize `dist-ish <= τ` where dist-ish is the mindist struct's dist
    * field, optionally wrapped in the portable rounding arithmetic. */
  private def prefilterFor(conjunct: Expression): Seq[Expression] = conjunct match {
    case LessThanOrEqual(left, Literal(t: Double, DoubleType)) =>
      unwrapDist(left).toSeq.flatMap { case (md, margin) => allowedPredicates(md, t + margin) }
    case GreaterThanOrEqual(Literal(t: Double, DoubleType), right) =>
      unwrapDist(right).toSeq.flatMap { case (md, margin) => allowedPredicates(md, t + margin) }
    case _ => Nil
  }

  private def stripCast(e: Expression): Expression = e match {
    case c: Cast => stripCast(c.child)
    case other   => other
  }

  /** Returns the SaxMindistExpr and the rounding slack of the wrapper. */
  private def unwrapDist(e: Expression): Option[(SaxMindistExpr, Double)] =
    stripCast(e) match {
      case GetStructField(md: SaxMindistExpr, 0, _) => Some((md, 0.0))
      // floor(dist * p + 0.5) / p  (QueryBase.pround / OracleGen.sround);
      // Floor yields LONG so Catalyst inserts Casts around it
      case Divide(num, Literal(p2: Double, DoubleType), _) =>
        stripCast(num) match {
          case Floor(Add(Multiply(inner, Literal(p1: Double, DoubleType), _), _, _))
            if p1 == p2 && p1 > 0 =>
            unwrapDist(inner).map { case (md, m) => (md, m + 0.5 / p1) }
          case _ => None
        }
      case _ => None
    }

  private def allowedPredicates(md: SaxMindistExpr, tau: Double): Seq[Expression] = {
    md.children match {
      case Seq(wordExpr, Literal(nA: Long, _), Literal(pat: UTF8String, StringType),
               Literal(0L, _), Literal(c: Int, _)) =>
        val pattern = pat.toString
        val pSym = Sax.parseSymbols(pattern, c)
        if (pSym == null || tau < 0) return Nil
        val w = pattern.length
        val n = if (nA > 0) nA else w.toLong
        val comp2 = n.toDouble / w.toDouble
        val table = Tables.distTable(c - 2)
        val chars = (0 until c).map(i => ('A' + i).toChar) :+ '#'

        def cellSq(wc: Char, pi: Int): Double = {
          var sa = if (wc == '#') c else c - (wc - 'A') - 1
          var sb = pSym(pi)
          if (sa == sb) return 0.0
          if (sa == c) sa = if (sb > c - 1 - sb) 0 else c - 1
          else if (sb == c) sb = if (sa > c - 1 - sa) 0 else c - 1
          val d = table(sa * c + sb).toDouble
          d * d
        }

        (0 until w).flatMap { i =>
          val allowed = chars.filter(ch => comp2 * cellSq(ch, i) <= tau * tau)
          // only inject when the position actually prunes something
          if (allowed.length == chars.length || allowed.isEmpty) None
          else Some(In(
            Substring(wordExpr, Literal(i + 1), Literal(1)),
            allowed.map(ch => Literal(UTF8String.fromString(ch.toString), StringType))))
        }
      case _ => Nil
    }
  }
}
