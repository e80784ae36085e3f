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
  * the plan [[graft.operators.TemporalOps.rangeJoinBinned]] builds by
  * hand: explode each interval into the `binWidth`-sized bins it covers,
  * equi-join on the bin, keep the original bounds as the join filter.
  *
  * The rewrite is semantics-preserving for ANY positive binWidth (the bin
  * match is a superset of the true match, and the original condition still
  * filters); width only tunes explode-factor vs candidate volume. It never
  * fires when the join already has an equi conjunct — Spark plans those as
  * hash/sort-merge joins on its own, and firing there would only add an
  * explode. Registered through [[graft.GraftExtensions]], so a plain
  * `spark.sql` user gets the rewrite with no code change.
  */
object RangeJoinRule extends Rule[LogicalPlan] with PredicateHelper {

  val BinWidthConf = "spark.graft.rangeJoin.binWidth"
  val DefaultBinWidth = 3600000000L // 1h in µs — override per workload

  /** Hard cap on bins one interval may explode into. An interval wider
    * than cap×binWidth (an open-ended sentinel hi, or a binWidth far too
    * small for the data's units) would otherwise materialize a
    * billion-element Sequence per row; the guard turns that into an
    * immediate, actionable error naming the config to fix. */
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
      val w = Literal(binWidth, LongType)
      // point side: one bin column
      val ptBin = Alias(IntegralDivide(lo.pt, w), "_graft_bin_pt")()
      val ptProj = Project(ptPlan.output :+ ptBin, ptPlan)
      val loDiv = IntegralDivide(lo.bound, w)
      val hiDiv = IntegralDivide(hi.bound, w)
      // runtime guard: an interval spanning more than maxBins bins fails
      // with an actionable message instead of materializing a huge array.
      // assert_true yields null when the predicate holds; folding that
      // null into the sequence start keeps the guard alive through column
      // pruning while never changing the value.
      val maxBins = SQLConf.get.getConfString(MaxBinsConf, DefaultMaxBins.toString).toLong
      val tooWide = GreaterThan(Subtract(hiDiv, loDiv), Literal(maxBins, LongType))
      val err = new RaiseError(Literal(
        s"graft range-join rewrite: an interval spans more than $maxBins bins " +
          s"(binWidth=$binWidth); raise $BinWidthConf to match the data's units " +
          s"or $MaxBinsConf if the explosion is intended"))
      val guard = Coalesce(Seq(
        Cast(If(tooWide, err, Literal.create(null, org.apache.spark.sql.types.NullType)),
          LongType),
        Literal(0L, LongType)))
      // interval side: explode the covered bin range. Sequence is
      // timezone-aware; the analyzer's ResolveTimeZone already ran, so the
      // rule must fill the zone itself or the plan goes back to unresolved.
      val seq = Sequence(Add(loDiv, guard), hiDiv, None)
        .withTimeZone(SQLConf.get.sessionLocalTimeZone)
      val gen = Explode(seq)
      val binAttr = AttributeReference("_graft_bin_iv",
        gen.elementSchema.head.dataType, gen.elementSchema.head.nullable)()
      val ivGen = Generate(gen, unrequiredChildIndex = Nil, outer = false,
        qualifier = None, generatorOutput = Seq(binAttr), child = ivPlan)
      val binEq = EqualTo(ptBin.toAttribute, binAttr)
      val (newLeft, newRight) =
        if (ptIsLeft) (ptProj, ivGen) else (ivGen: LogicalPlan, ptProj: LogicalPlan)
      val newJoin = Join(newLeft, newRight, Inner,
        Some((binEq +: conjuncts).reduce(And)), j.hint)
      Project(j.output, newJoin)
    }
  }
}
