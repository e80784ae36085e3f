package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, AttributeSet, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Native AS-OF JOIN — the full custom-operator ladder: a logical node, a
  * planner strategy, and a physical merge-join exec, registered via
  * [[graft.GraftExtensions]] (or installed on a live session through
  * `ExperimentalMethods`).
  *
  * Semantics (LEFT as-of): for every left row, attach the single right row
  * of the same key with the largest `rightTs <= leftTs`; unmatched left
  * rows keep nulls — exactly DuckDB's `ASOF LEFT JOIN ... ON l.k = r.k AND
  * l.ts >= r.ts` and the window formulation in
  * [[graft.operators.TemporalOps.asofJoin]]. Ties among right rows at the
  * same (key, ts) resolve to the row largest under `rightTiebreak`, making
  * the result deterministic under shuffle reordering (the window twin gets
  * this from its struct-ordered sort key).
  *
  * Physical shape — the same cost model as a sort-merge join, which is the
  * point: one hash exchange per side on the key, an in-partition sort by
  * (key, ts), then a single forward pass that keeps ONE buffered right row
  * (the current best match). Zero join amplification, O(1) state beyond
  * the iterators, no window state, and — unlike the union+window twin —
  * no unioned wide schema carrying null halves through the shuffle.
  * At 100 TB both children shuffle once and stream; skew on the key is
  * AQE-splittable like any sort-merge join.
  *
  * Null semantics match SQL joins: a null key or null timestamp on either
  * side never matches (`NULL = x` and `NULL >= x` are not true).
  *
  * `nearest = true` switches to merge_asof direction='nearest' semantics:
  * each left row matches the right row minimizing (|rightTs − leftTs|,
  * rightTs, tiebreak) — equidistant past/future ties resolve to the past
  * row (smaller ts), same-ts ties to the tiebreak-SMALLEST row, matching
  * [[graft.operators.TemporalOps.asofNearestEvents]]'s uniform argmin key.
  * The merge pass buffers the latest at-or-before row and peeks the first
  * after row — still O(1) state. Nearest requires a long-backed timestamp
  * (long / timestamp) so the distance compare is exact integer math.
  */
case class AsOfJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTs: Expression,
    rightTs: Expression,
    rightTiebreak: Seq[Expression],
    nearest: Boolean,
    rightSource: Seq[Attribute],
    rightOutput: Seq[Attribute]) extends BinaryNode {

  // left attrs pass through; the right half is re-minted (fresh exprIds,
  // nullable) so a self-join's id collisions can never reach this node's
  // output — the Generate pattern for attribute-producing nodes.
  // `rightSource` (the right child attrs the minted columns read) lives in
  // the expression list so `references` covers it — otherwise ColumnPruning
  // sees only the key/ts refs and prunes the very columns the output needs.
  override def output: Seq[Attribute] = left.output ++ rightOutput
  override def producedAttributes: AttributeSet = AttributeSet(rightOutput)
  override def maxRows: Option[Long] = left.maxRows

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

object AsOfJoin {
  /** Mint the node over resolved children, re-aliasing the right schema. */
  def resolved(left: LogicalPlan, right: LogicalPlan,
      leftKey: Expression, rightKey: Expression,
      leftTs: Expression, rightTs: Expression,
      rightTiebreak: Seq[Expression],
      nearest: Boolean = false): AsOfJoin = {
    require(leftKey.dataType == rightKey.dataType,
      s"as-of key types differ: ${leftKey.dataType} vs ${rightKey.dataType}")
    require(leftTs.dataType == rightTs.dataType,
      s"as-of timestamp types differ: ${leftTs.dataType} vs ${rightTs.dataType}")
    require(RowOrdering.isOrderable(leftTs.dataType) && RowOrdering.isOrderable(leftKey.dataType),
      "as-of key and timestamp types must be orderable")
    require(!nearest || (leftTs.dataType match {
      case org.apache.spark.sql.types.LongType |
           org.apache.spark.sql.types.TimestampType |
           org.apache.spark.sql.types.TimestampNTZType => true
      case _ => false
    }), s"nearest as-of requires a long-backed timestamp, got ${leftTs.dataType}")
    val minted = right.output.map(a =>
      AttributeReference(a.name, a.dataType, nullable = true, a.metadata)())
    AsOfJoin(left, right, leftKey, rightKey, leftTs, rightTs, rightTiebreak,
      nearest, right.output, minted)
  }
}

/** Plans [[AsOfJoin]] as [[AsOfJoinExec]]. Injected by GraftExtensions and
  * installable on a live session (see TemporalOps.asofJoinNative). */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case j: AsOfJoin =>
      AsOfJoinExec(j.leftKey, j.rightKey, j.leftTs, j.rightTs, j.rightTiebreak,
        j.nearest, j.rightSource, j.rightOutput,
        planLater(j.left), planLater(j.right)) :: Nil
    case _ => Nil
  }
}

/** Merge as-of join. Requires both children clustered on the key and
  * sorted by (key, ts[, tiebreak]); a single forward pass per partition
  * buffers at most ONE right row. */
case class AsOfJoinExec(
    leftKey: Expression,
    rightKey: Expression,
    leftTs: Expression,
    rightTs: Expression,
    rightTiebreak: Seq[Expression],
    nearest: Boolean,
    rightSource: Seq[Attribute],
    rightOutput: Seq[Attribute],
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  // physical nodes print with the "Exec" suffix stripped; keep the full
  // name so plan audits can grep for the operator unambiguously
  override def nodeName: String = "AsOfJoinExec"

  override def output: Seq[Attribute] = left.output ++ rightOutput
  override def producedAttributes: AttributeSet = AttributeSet(rightOutput)

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  // ascending, nulls first: null keys/timestamps all sit at the front of a
  // partition, where the merge pass skips them before real work starts
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending)) ++
      rightTiebreak.map(SortOrder(_, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lKeyExpr = leftKey
    val rKeyExpr = rightKey
    val lTsExpr = leftTs
    val rTsExpr = rightTs
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(Seq(lKeyExpr), lOut)
      val rKeyProj = UnsafeProjection.create(Seq(rKeyExpr), rOut)
      val lTsProj = UnsafeProjection.create(Seq(lTsExpr), lOut)
      val rTsProj = UnsafeProjection.create(Seq(rTsExpr), rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(Seq(lKeyExpr.dataType))
      val tsOrd = RowOrdering.createNaturalAscendingOrdering(Seq(lTsExpr.dataType))
      // output values = left attrs + the right SOURCE attrs, bound by
      // exprId against the joined (left, right-child) row — robust to any
      // column reorder the optimizer applies to the right child. The right
      // attrs are forced nullable: unmatched left rows carry an all-null
      // right half regardless of the child's declared nullability.
      // (BindReferences takes nullability from the INPUT schema attr, so
      // the relaxation must be on the input side)
      val outProj = UnsafeProjection.create(
        lOut ++ rightSource.map(_.withNullability(true)),
        lOut ++ rOut.map(_.withNullability(true)))
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rOut.size)

      if (nearest) new Iterator[InternalRow] {
        // merge pass, nearest direction: buffer the latest at-or-before
        // row (FIRST of its ts group — smallest tiebreak, which the
        // argmin prefers on ties) and peek rHead as the earliest-after
        // candidate (first in sort order past lt ⇒ earliest ts, smallest
        // tiebreak). Equidistant past/future resolves to past. Timestamps
        // are long-backed (enforced in AsOfJoin.resolved), so distances
        // are exact integer math.
        private var rHead: InternalRow = if (rIter.hasNext) rIter.next() else null
        private var bestMatch: InternalRow = null // copy of latest rt<=lt row
        private var bestKey: InternalRow = null   // its key (copied)
        private var bestTs: Long = 0L

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val l = lIter.next()
          val lk = lKeyProj(l)
          val lkNull = lk.isNullAt(0)
          val lt = lTsProj(l)
          val ltNull = lt.isNullAt(0)
          var fut: InternalRow = null // rHead iff same-key, rt > lt
          if (!lkNull && !ltNull) {
            val ltv = lt.getLong(0)
            var done = false
            while (!done && rHead != null) {
              val rk = rKeyProj(rHead)
              if (rk.isNullAt(0)) {
                advance()
              } else {
                val c = keyOrd.compare(rk, lk)
                if (c < 0) {
                  advance()
                } else if (c > 0) {
                  done = true
                } else {
                  val rt = rTsProj(rHead)
                  if (rt.isNullAt(0)) {
                    advance() // nulls sort first within the key; skip
                  } else if (rt.getLong(0) <= ltv) {
                    val rtv = rt.getLong(0)
                    // strictly-newer ts supersedes; an equal-ts row is a
                    // LARGER tiebreak under the child sort — keep first
                    if (bestMatch == null || keyOrd.compare(bestKey, lk) != 0
                        || rtv > bestTs) {
                      bestMatch = rHead.copy()
                      bestKey = lk.copy()
                      bestTs = rtv
                    }
                    advance()
                  } else {
                    done = true
                    fut = rHead
                  }
                }
              }
            }
          }
          val pastOk = !lkNull && !ltNull && bestMatch != null &&
            keyOrd.compare(bestKey, lk) == 0
          val r =
            if (!pastOk && fut == null) nullRight
            else if (fut == null) bestMatch
            else if (!pastOk) fut
            else {
              val ltv = lt.getLong(0)
              // ties (dPast == dFuture) go to the past row: smaller ts,
              // matching the (|Δ|, ts, tiebreak) argmin
              if (ltv - bestTs <= rTsProj(fut).getLong(0) - ltv) bestMatch
              else fut
            }
          outProj(joined(l, r))
        }

        private def advance(): Unit =
          rHead = if (rIter.hasNext) rIter.next() else null
      }
      else new Iterator[InternalRow] {
        // rHead: the next not-yet-consumed right row (sort iterators reuse
        // row objects, but only calling next() invalidates the previous
        // reference — holding rHead across left rows is safe, buffering a
        // match is not, hence the copy())
        private var rHead: InternalRow = if (rIter.hasNext) rIter.next() else null
        private var bestMatch: InternalRow = null // copy of latest rt<=lt row
        private var bestKey: InternalRow = null   // its key (copied)

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val l = lIter.next()
          val lk = lKeyProj(l)
          val lkNull = lk.isNullAt(0)
          val lt = lTsProj(l)
          val ltNull = lt.isNullAt(0)
          if (!lkNull && !ltNull) {
            var done = false
            while (!done && rHead != null) {
              val rk = rKeyProj(rHead)
              if (rk.isNullAt(0)) {
                advance() // null key never matches; sorted to the front
              } else {
                val c = keyOrd.compare(rk, lk)
                if (c < 0) {
                  advance() // right key already passed by the left cursor
                } else if (c > 0) {
                  done = true
                } else {
                  val rt = rTsProj(rHead)
                  if (rt.isNullAt(0)) {
                    advance() // null ts never matches
                  } else if (tsOrd.compare(rt, lt) <= 0) {
                    // a newer (or tiebreak-larger, given the child sort)
                    // eligible row — it supersedes the previous best
                    bestMatch = rHead.copy()
                    bestKey = lk.copy()
                    advance()
                  } else {
                    done = true
                  }
                }
              }
            }
          }
          val matched = !lkNull && !ltNull && bestMatch != null &&
            keyOrd.compare(bestKey, lk) == 0
          outProj(if (matched) joined(l, bestMatch) else joined(l, nullRight))
        }

        private def advance(): Unit =
          rHead = if (rIter.hasNext) rIter.next() else null
      }
    }
  }
}
