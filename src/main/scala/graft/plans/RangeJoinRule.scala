package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.LongType

/** Optimizer rule: rewrite a KEY-LESS interval join into a binned
  * equi-join.
  *
  * `points JOIN intervals ON pt >= lo AND pt < hi` has no equi conjunct,
  * so Spark can only plan it as BroadcastNestedLoopJoin / CartesianProduct
  * — O(|points| × |intervals|) comparisons. This rule recognizes the
  * containment pattern (a long "point" expression from one side bounded
  * below and above by expressions from the other side) and rewrites it to
  * a TWO-TIER variant of the plan
  * [[graft.operators.TemporalOps.rangeJoinBinned]] builds by hand: each
  * interval explodes into the `binWidth`-sized bins it covers; an
  * interval wider than `maxBins` bins falls back to a coarse tier of
  * width `binWidth × maxBins` (the 2-level special case of
  * [[graft.operators.TemporalOps.rangeJoinLadder]]) instead of raising,
  * so mixed-width interval sets — a sentinel-wide row among narrow ones —
  * still plan as a bounded equi-join. Tier and bin are packed into ONE
  * long key (`bin*2 + tier`), each point emits its two tier keys, and the
  * original bounds stay as the join filter.
  *
  * The rewrite is semantics-preserving for ANY positive binWidth (the bin
  * match is a superset of the true match, and the original condition still
  * filters); width only tunes explode-factor vs candidate volume. An
  * INVERTED interval (hi < lo — swapped bounds or a sentinel bug) emits
  * no bins at all rather than a descending runaway Sequence. It never
  * fires when the join already has an equi conjunct — Spark plans those as
  * hash/sort-merge joins on its own, and firing there would only add an
  * explode. Registered through [[graft.GraftExtensions]], so a plain
  * `spark.sql` user gets the rewrite with no code change.
  */
object RangeJoinRule extends Rule[LogicalPlan] with PredicateHelper {

  val BinWidthConf = "spark.graft.rangeJoin.binWidth"
  val DefaultBinWidth = 3600000000L // 1h in µs — override per workload

  /** Bins-per-interval bound at which an interval switches to the coarse
    * tier (width binWidth×maxBins). Only an interval too wide for the
    * coarse tier TOO — more than maxBins² base bins (an open-ended
    * sentinel hi, or a binWidth absurdly small for the data's units) —
    * raises an actionable error naming the config to fix, instead of
    * materializing a billion-element Sequence per row. */
  val MaxBinsConf = "spark.graft.rangeJoin.maxBinsPerInterval"
  val DefaultMaxBins = 65536L

  /** A lower or upper bound conjunct, normalized to (point, bound). */
  private sealed trait Bound { def pt: Expression; def bound: Expression; def orig: Expression }
  private case class Lower(pt: Expression, bound: Expression, orig: Expression) extends Bound
  private case class Upper(pt: Expression, bound: Expression, orig: Expression) extends Bound

  private def asBound(e: Expression): Option[Bound] = e match {
    case GreaterThanOrEqual(a, b) => Some(Lower(a, b, e))
    case GreaterThan(a, b)        => Some(Lower(a, b, e))
    case LessThan(a, b)           => Some(Upper(a, b, e))
    case LessThanOrEqual(a, b)    => Some(Upper(a, b, e))
    case _ => None
  }

  /** Mirror `bound op pt` forms into `pt op bound` form. */
  private def normalized(e: Expression, ptSide: AttributeSet): Option[Bound] =
    asBound(e).flatMap { b =>
      if (b.pt.references.nonEmpty && b.pt.references.subsetOf(ptSide)) Some(b)
      else asBound(e match {
        case GreaterThanOrEqual(a, c) => LessThanOrEqual(c, a)
        case GreaterThan(a, c)        => LessThan(c, a)
        case LessThan(a, c)           => GreaterThan(c, a)
        case LessThanOrEqual(a, c)    => GreaterThanOrEqual(c, a)
        case other                    => other
      }).filter(m => m.pt.references.nonEmpty && m.pt.references.subsetOf(ptSide))
        .map {
          case Lower(p, c, _) => Lower(p, c, e)
          case Upper(p, c, _) => Upper(p, c, e)
        }
    }

  private def binWidth: Long =
    SQLConf.get.getConfString(BinWidthConf, DefaultBinWidth.toString).toLong

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(left, right, Inner, Some(cond), _) if eligible(j, cond) =>
      rewrite(j, left, right, cond).getOrElse(j)
  }

  private def eligible(j: Join, cond: Expression): Boolean = {
    val conjuncts = splitConjunctivePredicates(cond)
    // an existing cross-side equi conjunct means Spark already has a hash
    // join key — don't touch
    val hasEqui = conjuncts.exists {
      case EqualTo(a, b) => crossSide(j, a, b)
      case EqualNullSafe(a, b) => crossSide(j, a, b)
      case _ => false
    }
    !hasEqui
  }

  private def crossSide(j: Join, a: Expression, b: Expression): Boolean =
    (a.references.subsetOf(j.left.outputSet) && b.references.subsetOf(j.right.outputSet) &&
      a.references.nonEmpty && b.references.nonEmpty) ||
      (a.references.subsetOf(j.right.outputSet) && b.references.subsetOf(j.left.outputSet) &&
        a.references.nonEmpty && b.references.nonEmpty)

  private def rewrite(j: Join, left: LogicalPlan, right: LogicalPlan,
      cond: Expression): Option[LogicalPlan] = {
    val conjuncts = splitConjunctivePredicates(cond)

    def tryOrientation(ptPlan: LogicalPlan, ivPlan: LogicalPlan): Option[(Bound, Bound)] = {
      val ptSide = ptPlan.outputSet
      val ivSide = ivPlan.outputSet
      val bounds = conjuncts.flatMap(c => normalized(c, ptSide))
        .filter(b => b.bound.references.nonEmpty && b.bound.references.subsetOf(ivSide) &&
          b.pt.dataType == LongType && b.bound.dataType == LongType &&
          b.pt.deterministic && b.bound.deterministic)
      for {
        lo <- bounds.collectFirst { case b: Lower => b }
        hi <- bounds.collectFirst {
          case b: Upper if b.pt.semanticEquals(lo.pt) => b
        }
      } yield (lo, hi)
    }

    val oriented: Option[(LogicalPlan, LogicalPlan, Bound, Bound, Boolean)] =
      tryOrientation(left, right).map { case (lo, hi) => (left, right, lo, hi, true) }
        .orElse(tryOrientation(right, left).map { case (lo, hi) => (right, left, lo, hi, false) })

    oriented.map { case (ptPlan, ivPlan, lo, hi, ptIsLeft) =>
      val maxBins = SQLConf.get.getConfString(MaxBinsConf, DefaultMaxBins.toString).toLong
      val w0 = Literal(binWidth, LongType)
      val w1 = Literal(binWidth * maxBins, LongType) // coarse fallback tier
      val two = Literal(2L, LongType)
      val one = Literal(1L, LongType)
      // packed key: bin*2 + tier — tier-0 keys even, tier-1 keys odd, so
      // one long equi-join column carries both resolutions
      def key(value: Expression, w: Literal, tier: Literal): Expression =
        Add(Multiply(IntegralDivide(value, w), two), tier)
      // point side: explode the point's two tier keys (2 rows per point —
      // the price of never nested-looping on a mixed-width interval set)
      val ptGen = Explode(CreateArray(Seq(
        key(lo.pt, w0, Literal(0L, LongType)), key(lo.pt, w1, one))))
      val ptKey = AttributeReference("_graft_key_pt",
        ptGen.elementSchema.head.dataType, ptGen.elementSchema.head.nullable)()
      val ptGenerate = Generate(ptGen, unrequiredChildIndex = Nil, outer = false,
        qualifier = None, generatorOutput = Seq(ptKey), child = ptPlan)
      val loDiv0 = IntegralDivide(lo.bound, w0)
      val hiDiv0 = IntegralDivide(hi.bound, w0)
      val loDiv1 = IntegralDivide(lo.bound, w1)
      val hiDiv1 = IntegralDivide(hi.bound, w1)
      // interval tiering: inverted (hi < lo) → no bins; wider than maxBins
      // base bins → coarse tier; wider than maxBins COARSE bins → raise
      // with an actionable message instead of materializing a huge array.
      val inverted = LessThan(hiDiv0, loDiv0)
      val wide = GreaterThan(Subtract(hiDiv0, loDiv0), Literal(maxBins, LongType))
      val pathological = GreaterThan(Subtract(hiDiv1, loDiv1), Literal(maxBins, LongType))
      val err = new RaiseError(Literal(
        s"graft range-join rewrite: an interval spans more than $maxBins coarse " +
          s"bins (binWidth=$binWidth, coarse=${binWidth * maxBins}); raise " +
          s"$BinWidthConf to match the data's units or $MaxBinsConf if the " +
          s"explosion is intended"))
      // assert-style guard: null when healthy, folded into the sequence
      // start so column pruning can't drop it while the value is unchanged
      val guard = Coalesce(Seq(
        Cast(If(pathological, err, Literal.create(null, org.apache.spark.sql.types.NullType)),
          LongType),
        Literal(0L, LongType)))
      // Sequence is timezone-aware; the analyzer's ResolveTimeZone already
      // ran, so the rule must fill the zone itself or the plan goes back
      // to unresolved.
      val tz = SQLConf.get.sessionLocalTimeZone
      val seqNarrow = Sequence(Multiply(loDiv0, two), Multiply(hiDiv0, two),
        Some(two)).withTimeZone(tz)
      val seqWide = Sequence(Add(Multiply(loDiv1, two), Add(one, guard)),
        Add(Multiply(hiDiv1, two), one), Some(two)).withTimeZone(tz)
      val bins = If(inverted,
        Literal.create(null, seqNarrow.dataType),
        If(wide, seqWide, seqNarrow))
      val ivGen = Explode(bins)
      val ivKey = AttributeReference("_graft_key_iv",
        ivGen.elementSchema.head.dataType, ivGen.elementSchema.head.nullable)()
      val ivGenerate = Generate(ivGen, unrequiredChildIndex = Nil, outer = false,
        qualifier = None, generatorOutput = Seq(ivKey), child = ivPlan)
      val keyEq = EqualTo(ptKey, ivKey)
      val (newLeft, newRight) =
        if (ptIsLeft) (ptGenerate, ivGenerate) else (ivGenerate: LogicalPlan, ptGenerate: LogicalPlan)
      val newJoin = Join(newLeft, newRight, Inner,
        Some((keyEq +: conjuncts).reduce(And)), j.hint)
      Project(j.output, newJoin)
    }
  }
}
