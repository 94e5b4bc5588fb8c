package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Native as-of join — the full custom-operator tier: a logical node, a
  * planner strategy, and a physical merge-join operator, registered
  * through `SparkSessionExtensions` ([[GraftExtensions]]).
  *
  * Semantics (reference: the per-key "current version at time t" reads of
  * aws/dynamo_manager.py:60-99, generalized): for every left row, the
  * single right row with the same key and the greatest timestamp
  * `<= ` the left timestamp — LEFT OUTER, so unmatched left rows emit
  * nulls on the right.
  *
  * Why a physical operator: the declarative encoding (union + window,
  * [[graft.operators.JoinOps.asofJoinOf]]) pays a union of both inputs,
  * a window sort over the combined stream, and a filter back down to the
  * left rows. This operator declares `ClusteredDistribution` on the key
  * and per-key `(key, ts)` ordering, so Catalyst co-partitions both
  * sides exactly like a sort-merge join (one shuffle each, AQE-sized),
  * and then a single forward merge pass per partition emits matches with
  * O(1) state — no union, no window buffer, no post-filter. Ordering
  * requirements are satisfied for free if either side is already
  * bucketed+sorted by key.
  */
case class AsOfJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTs: Expression,
    rightTs: Expression,
    rightTies: Seq[Expression]) extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, rk, lts, rts, ties) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lts, rts, ties) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTs: Expression,
    rightTs: Expression,
    rightTies: Seq[Expression]) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  /** Same contract as a sort-merge join: both sides hash-clustered on
    * their keys (EnsureRequirements co-partitions them), each partition
    * sorted by (key, ts [, ties]) so one forward pass suffices. */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTs).map(SortOrder(_, Ascending)),
    (rightKeys ++ (rightTs +: rightTies)).map(SortOrder(_, Ascending)))

  override def outputOrdering: Seq[SortOrder] =
    (leftKeys :+ leftTs).map(SortOrder(_, Ascending))

  protected override def doExecute(): RDD[InternalRow] = {
    val rightFieldCount = right.output.size
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(leftKeys, left.output)
      val rKeyProj = UnsafeProjection.create(rightKeys, right.output)
      val lTsProj = UnsafeProjection.create(Seq(leftTs), left.output)
      val rTsProj = UnsafeProjection.create(Seq(rightTs), right.output)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(leftKeys.map(_.dataType))
      val tsOrd = RowOrdering.createNaturalAscendingOrdering(Seq(leftTs.dataType))
      val resultProj = UnsafeProjection.create(output, output)
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rightFieldCount)

      new Iterator[InternalRow] {
        // one-row lookahead on the right, plus the current best candidate
        // for the key under the cursor — O(1) state per partition
        private var rHead: InternalRow = _
        private var rHeadKey: InternalRow = _
        private var rHeadTs: InternalRow = _
        private var cand: InternalRow = _
        private var candKey: InternalRow = _

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val l = lIter.next()
          val lKey = lKeyProj(l).copy()
          val lTsRow = lTsProj(l).copy()
          if (cand != null && keyOrd.compare(candKey, lKey) != 0) {
            cand = null; candKey = null
          }
          var scan = true
          while (scan && (rHead != null || rIter.hasNext)) {
            if (rHead == null) {
              // shuffle iterators reuse row buffers: copy what we hold
              rHead = rIter.next().copy()
              rHeadKey = rKeyProj(rHead).copy()
              rHeadTs = rTsProj(rHead).copy()
            }
            val kc = keyOrd.compare(rHeadKey, lKey)
            if (kc < 0) {
              rHead = null // right key already passed: discard
            } else if (kc == 0 && tsOrd.compare(rHeadTs, lTsRow) <= 0) {
              cand = rHead; candKey = rHeadKey // newer eligible match
              rHead = null
            } else {
              scan = false // right is ahead of this left row
            }
          }
          resultProj(joined(l, if (cand != null) cand else nullRight))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** DataFrame-level entry point for the native as-of join. */
object AsOfJoinNative {
  import org.apache.spark.sql.{DataFrame, GraftBridge}
  import org.apache.spark.sql.functions.col

  /** LEFT OUTER as-of join: for each left row, the right row with equal
    * `key` and the greatest `tsCol <= ` the left `tsCol` (ties broken by
    * the greatest `rightTie`). Output = left columns then right columns
    * (callers rename collisions). Registers [[AsOfJoinStrategy]] on the
    * session if the `spark.sql.extensions=graft.plans.GraftExtensions`
    * route didn't already. */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, tsCol: String,
      rightTie: String): DataFrame = {
    val spark = left.sparkSession
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    // a self-join's children may share attribute ids — re-alias the right
    // side so the join output carries distinct ids
    val lIds = left.queryExecution.analyzed.output.map(_.exprId).toSet
    val rightSafe =
      if (right.queryExecution.analyzed.output.exists(a => lIds(a.exprId)))
        right.select(right.columns.map(c => col(c).as(c)).toIndexedSeq: _*)
      else right
    val lp = left.queryExecution.analyzed
    val rp = rightSafe.queryExecution.analyzed
    def attr(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, n: String) =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"column '$n' not found in ${p.output.map(_.name)}"))
    GraftBridge.ofRows(spark, AsOfJoin(lp, rp,
      Seq(attr(lp, key)), Seq(attr(rp, key)),
      attr(lp, tsCol), attr(rp, tsCol), Seq(attr(rp, rightTie))))
  }
}
