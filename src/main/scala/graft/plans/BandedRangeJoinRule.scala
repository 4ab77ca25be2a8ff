package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Optimizer rule (SURVEY §4.2 tier (c): custom `Rule[LogicalPlan]`)
  * rewriting non-equi interval-containment joins
  *
  *   L JOIN R ON l.ts >= r.start AND l.ts < r.end [AND …]
  *
  * — which vanilla Spark plans as a BroadcastNestedLoopJoin, quadratic
  * when neither side broadcasts — into the banded equi-join shape of
  * [[graft.operators.RangeJoin]]: both sides gain a band key
  * (`micros div band`; the right interval explodes into every band it
  * covers), the join becomes a shuffled equi-join on the band, and the
  * original containment predicates remain as the exact filter. Truncating
  * integer division is monotone, so bandOf(start) ≤ bandOf(ts) ≤
  * bandOf(end) whenever start ≤ ts ≤ end — no qualifying pair is lost.
  *
  * Guarded by `spark.graft.rangeJoin.bandMicros` (≤ 0 or unset = off) so
  * the rule is inert unless a session opts in. It skips joins that
  * already have an equi predicate (SortMergeJoin handles those), and is
  * idempotent: the rewritten join's band-equality conjunct disqualifies
  * it from matching again. Register per session via
  * `spark.experimental.extraOptimizations` or cluster-wide through
  * `graft.GraftExtensions`.
  */
object BandedRangeJoinRule extends Rule[LogicalPlan] with PredicateHelper {

  val ConfKey = "spark.graft.rangeJoin.bandMicros"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val raw = conf.getConfString(ConfKey, "0")
    val band =
      try raw.trim.toLong
      catch {
        case _: NumberFormatException =>
          // a clear config error, not a NumberFormatException deep in
          // Catalyst failing every query in the session
          throw new IllegalArgumentException(
            s"$ConfKey must be an integral microsecond width, got '$raw'")
      }
    if (band <= 0) plan
    else plan.transformUp {
      case j @ Join(l, r, Inner, Some(cond), hint) =>
        rewrite(l, r, cond, hint, band)
          .orElse(rewriteOverlap(l, r, cond, hint, band))
          .getOrElse(j)
    }
  }

  /** Timestamp → epoch micros; integral columns pass through.
    * TIMESTAMP_NTZ (the no-timezone parquet flavor) routes through an
    * explicit session-zone Cast to TimestampType — exact microsecond
    * banding preserved (a direct long cast would truncate to seconds),
    * and the zone mapping is monotone, which is all banding requires.
    * The Cast carries the zone because this runs post-ResolveTimeZone. */
  private def micros(e: Expression): Option[Expression] = e.dataType match {
    case TimestampType => Some(UnixMicros(e))
    case TimestampNTZType =>
      Some(UnixMicros(Cast(e, TimestampType, Some(conf.sessionLocalTimeZone))))
    case LongType => Some(e)
    case _ => None
  }

  /** Interval-OVERLAP joins — `L JOIN R ON l.s < r.e AND r.s < l.e`
    * (two strict inequalities in opposite directions; the half-open
    * overlap test) — rewritten to the double-banded equi-join of
    * [[graft.operators.RangeJoin.bandedOverlapJoin]]: BOTH sides
    * explode into their covered bands, the join equates the band keys,
    * and each qualifying pair is kept only in the first band of its
    * intersection (`band == max(l.s, r.s) div width`), so no distinct
    * pass is needed. Same opt-in conf, same idempotence guard (the
    * rewritten join carries a band equality). */
  private def rewriteOverlap(l: LogicalPlan, r: LogicalPlan,
      cond: Expression, hint: JoinHint, band: Long): Option[LogicalPlan] = {
    val conjuncts = splitConjunctivePredicates(cond)
    def leftOnly(e: Expression) =
      e.references.nonEmpty && e.references.subsetOf(l.outputSet)
    def rightOnly(e: Expression) =
      e.references.nonEmpty && e.references.subsetOf(r.outputSet)
    val hasEqui = conjuncts.exists {
      case EqualTo(a, b) =>
        (leftOnly(a) && rightOnly(b)) || (rightOnly(a) && leftOnly(b))
      case _ => false
    }
    if (hasEqui) return None
    // l.s < r.e (either spelling)
    val lStartREnd = conjuncts.collect {
      case LessThan(ls, re) if leftOnly(ls) && rightOnly(re) => (ls, re)
      case GreaterThan(re, ls) if rightOnly(re) && leftOnly(ls) => (ls, re)
    }
    // r.s < l.e (either spelling)
    val rStartLEnd = conjuncts.collect {
      case LessThan(rs, le) if rightOnly(rs) && leftOnly(le) => (rs, le)
      case GreaterThan(le, rs) if leftOnly(le) && rightOnly(rs) => (rs, le)
    }
    val quad = (for {
      (ls, re) <- lStartREnd
      (rs, le) <- rStartLEnd
      // a genuine interval pair: the left's start and end are distinct
      // expressions (ditto right) — otherwise this is a plain band-able
      // point comparison the containment path owns
      if !ls.semanticEquals(le) && !rs.semanticEquals(re)
    } yield (ls, le, rs, re)).headOption
    quad.flatMap { case (ls, le, rs, re) =>
      // All four endpoints must band in the SAME unit: timestamps map to
      // epoch MICROS while longs pass through as-is, so a schema mixing
      // the two (each conjunct type-checks on its own!) would band the
      // sides incompatibly — exploding ~1e9 bands per row or silently
      // dropping qualifying pairs. Mixed units bail out to the original
      // (correct, un-banded) join.
      val kinds = Seq(ls, le, rs, re).map(_.dataType).map {
        case TimestampType | TimestampNTZType => "ts"
        case LongType => "long"
        case _ => "other"
      }.toSet
      if (kinds.size != 1) None
      else for {
        lsM <- micros(ls); leM <- micros(le)
        rsM <- micros(rs); reM <- micros(re)
      } yield {
        val bandLit = Literal(band)
        def gen(startM: Expression, endM: Expression, name: String,
            child: LogicalPlan): (Generate, AttributeReference) = {
          val sDiv = IntegralDivide(startM, bandLit)
          val eDiv = IntegralDivide(endM, bandLit)
          val g = Explode(new Sequence(sDiv, Greatest(Seq(sDiv, eDiv)),
            Literal(1L)).withTimeZone(conf.sessionLocalTimeZone))
          val out = AttributeReference(name,
            g.elementSchema.head.dataType, g.elementSchema.head.nullable)()
          (Generate(g, unrequiredChildIndex = Nil, outer = false,
            qualifier = None, generatorOutput = Seq(out), child = child),
            out)
        }
        val (leftB, lOut) = gen(lsM, leM, "__graft_oband_l", l)
        val (rightB, rOut) = gen(rsM, reM, "__graft_oband_r", r)
        // keep each pair only in the first band of its intersection
        val firstBand = EqualTo(lOut,
          IntegralDivide(Greatest(Seq(lsM, rsM)), bandLit))
        val newCond = (EqualTo(lOut, rOut) +: firstBand +: conjuncts)
          .reduce[Expression](And)
        Project(l.output ++ r.output,
          Join(leftB, rightB, Inner, Some(newCond), hint))
      }
    }
  }

  private def rewrite(l: LogicalPlan, r: LogicalPlan, cond: Expression,
      hint: JoinHint, band: Long): Option[LogicalPlan] = {
    val conjuncts = splitConjunctivePredicates(cond)
    def leftOnly(e: Expression) =
      e.references.nonEmpty && e.references.subsetOf(l.outputSet)
    def rightOnly(e: Expression) =
      e.references.nonEmpty && e.references.subsetOf(r.outputSet)
    // an existing cross-side equi predicate means Spark already has a
    // hash/sort-merge key — and its presence after OUR rewrite is what
    // makes the rule idempotent
    val hasEqui = conjuncts.exists {
      case EqualTo(a, b) =>
        (leftOnly(a) && rightOnly(b)) || (rightOnly(a) && leftOnly(b))
      case _ => false
    }
    if (hasEqui) return None
    // l.ts >= r.start (either spelling)
    val lower = conjuncts.collect {
      case GreaterThanOrEqual(ts, st) if leftOnly(ts) && rightOnly(st) => (ts, st)
      case LessThanOrEqual(st, ts) if rightOnly(st) && leftOnly(ts) => (ts, st)
    }
    // l.ts < r.end (either spelling)
    val upper = conjuncts.collect {
      case LessThan(ts, en) if leftOnly(ts) && rightOnly(en) => (ts, en)
      case GreaterThan(en, ts) if rightOnly(en) && leftOnly(ts) => (ts, en)
    }
    val pair = (for {
      (ts, st) <- lower
      (ts2, en) <- upper if ts.semanticEquals(ts2)
    } yield (ts, st, en)).headOption
    pair.flatMap { case (ts, st, en) =>
      for {
        tsM <- micros(ts); stM <- micros(st); enM <- micros(en)
      } yield {
        val bandLit = Literal(band)
        val lBand = Alias(IntegralDivide(tsM, bandLit), "__graft_band")()
        val leftB = Project(l.output :+ lBand, l)
        // Sequence is TimeZoneAwareExpression: the analyzer's
        // ResolveTimeZone pass already ran, so set the zone explicitly
        // or the node stays unresolved and plan validation rejects it.
        // The stop is clamped to max(start, end): an inverted interval
        // (end < start — dirty data) must yield zero joined rows like the
        // un-rewritten nested-loop join, not a Sequence runtime error;
        // the one band it generates is discarded by the exact filter.
        val stDiv = IntegralDivide(stM, bandLit)
        val enDiv = IntegralDivide(enM, bandLit)
        val gen = Explode(new Sequence(
          stDiv, Greatest(Seq(stDiv, enDiv)),
          Literal(1L)).withTimeZone(conf.sessionLocalTimeZone))
        val genOut = AttributeReference("__graft_band_r",
          gen.elementSchema.head.dataType,
          gen.elementSchema.head.nullable)()
        val rightB = Generate(gen, unrequiredChildIndex = Nil,
          outer = false, qualifier = None,
          generatorOutput = Seq(genOut), child = r)
        val newCond = (EqualTo(lBand.toAttribute, genOut) +: conjuncts)
          .reduce[Expression](And)
        Project(l.output ++ r.output,
          Join(leftB, rightB, Inner, Some(newCond), hint))
      }
    }
  }
}
