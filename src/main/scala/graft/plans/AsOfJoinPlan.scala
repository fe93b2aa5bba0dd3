package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, AttributeSet, BindReferences, Descending, Expression,
  GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{
  ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** The as-of join as a first-class Catalyst operator — the full extension
  * ladder the builder brief's preference (c) describes: a custom
  * [[LogicalPlan]] node, a [[SparkStrategy]] planning it, and a physical
  * [[AsOfJoinExec]], registered through `SparkSessionExtensions`
  * ([[graft.GraftExtensions]]).
  *
  * Semantics (reference: Polars `join_asof`, DuckDB `ASOF JOIN`; see
  * `silver/main.py:131-166`'s split-carry shape): for every left row,
  * attach the latest right row of the same key with right-time ≤ left-time
  * (backward) or the earliest with right-time ≥ left-time (forward). Ties
  * match. Right rows are expected unique per (key, time); key and time
  * columns are expected non-null (null times never match or carry).
  *
  * Physical shape: each side hash-clustered on the key and sorted by
  * (key, time) — time descending for forward — then a single linear merge
  * per partition with O(1) carried state. Exactly one exchange per side and
  * no buffering of either input, so the operator streams at any scale; the
  * same cost envelope as a sort-merge join. The composed window form
  * ([[graft.operators.AsOfJoin.asOf]]) remains the default query path; this
  * operator is the native alternative, proven row-identical by
  * AsOfJoinSpec and the `q_asof_native` oracle.
  */
case class AsOfJoinNode(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Attribute],
    rightKeys: Seq[Attribute],
    leftTime: Attribute,
    rightTime: Attribute,
    rightCarry: Seq[Attribute],
    outAttrs: Seq[Attribute],
    forward: Boolean) extends BinaryNode {

  override def output: Seq[Attribute] = left.output ++ outAttrs

  // outAttrs are minted by this node, not pulled from children — declare
  // them so missingInput stays empty and the analyzer accepts the node.
  override def producedAttributes: AttributeSet = AttributeSet(outAttrs)

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

/** Column pruning through [[AsOfJoinNode]]: Catalyst's ColumnPruning only
  * understands built-in nodes, so without this rule a custom operator
  * blocks pruning and the left scan reads every column regardless of what
  * the query projects. When a Project above the node needs only a subset
  * of the left output, push a Project into the left child (the node's
  * own expressions — keys and time — are always retained). The right side
  * needs no rule: its contract (keys + time + carry values) is already
  * projected at construction ([[graft.operators.AsOfJoin.asOfNative]]). */
object PruneAsOfJoin extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.plans.logical.Project
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case p @ Project(projList, j: AsOfJoinNode) =>
      val needed = AttributeSet(projList.flatMap(_.references)) ++
        AttributeSet(j.leftKeys) ++ AttributeSet(Seq(j.leftTime))
      val keptLeft = j.left.output.filter(needed.contains)
      if (keptLeft.length < j.left.output.length)
        p.copy(child = j.copy(left = Project(keptLeft, j.left)))
      else p
  }
}

/** Plans [[AsOfJoinNode]] → [[AsOfJoinExec]]. Injected via
  * `SparkSessionExtensions.injectPlannerStrategy`. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case n: AsOfJoinNode =>
      AsOfJoinExec(n.leftKeys, n.rightKeys, n.leftTime, n.rightTime,
        n.rightCarry, n.outAttrs, n.forward,
        planLater(n.left), planLater(n.right)) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    rightCarry: Seq[Expression],
    outAttrs: Seq[Attribute],
    forward: Boolean,
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ outAttrs

  // One hash exchange per side; EnsureRequirements co-partitions the two
  // ClusteredDistributions exactly as it does for a shuffled join.
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  private def timeDir = if (forward) Descending else Ascending

  // Keys ascending, time in traversal order (descending for forward: the
  // merge walks latest→earliest so "last consumed" is the earliest
  // right row ≥ the left time — the exact mirror of backward).
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTime, timeDir),
    rightKeys.map(SortOrder(_, Ascending)) :+ SortOrder(rightTime, timeDir))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val keyTypes = leftKeys.map(_.dataType)
    val timeType = leftTime.dataType
    val fwd = forward
    val nCarry = outAttrs.length
    val leftOut = left.output
    val rightOut = right.output
    val lKeyExprs = leftKeys
    val rKeyExprs = rightKeys
    val lTimeExpr = leftTime
    val rTimeExpr = rightTime
    val carryExprs = rightCarry
    val outSchema = output

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeyExprs, leftOut)
      val rKeyProj = UnsafeProjection.create(rKeyExprs, rightOut)
      val carryProj = UnsafeProjection.create(carryExprs, rightOut)
      val resultProj = UnsafeProjection.create(outSchema, leftOut ++ outAttrs)
      val lTimeBound = BindReferences.bindReference(lTimeExpr, leftOut)
      val rTimeBound = BindReferences.bindReference(rTimeExpr, rightOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val timeOrd = TypeUtils.getInterpretedOrdering(timeType)
      val nullRow = new GenericInternalRow(nCarry)
      val joined = new JoinedRow

      new Iterator[InternalRow] {
        // the current right row's backing buffer is only valid until the
        // next rIter.next(); everything retained across calls is copied
        private var rRow: InternalRow = if (rIter.hasNext) rIter.next() else null
        private var carryRow: InternalRow = _
        private var carryKey: InternalRow = _

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val lRow = lIter.next()
          val lKey = lKeyProj(lRow)
          val lT = lTimeBound.eval(lRow)
          var scanning = rRow != null && lT != null
          while (scanning) {
            val c = keyOrd.compare(rKeyProj(rRow), lKey)
            val rT = if (c <= 0) rTimeBound.eval(rRow) else null
            val consume = c < 0 || (c == 0 && rT != null && {
              val tc = timeOrd.compare(rT, lT)
              if (fwd) tc >= 0 else tc <= 0
            }) || (c == 0 && rT == null)
            if (consume) {
              if (c == 0 && rT != null) {
                carryRow = carryProj(rRow).copy()
                carryKey = rKeyProj(rRow).copy()
              }
              rRow = if (rIter.hasNext) rIter.next() else null
              scanning = rRow != null
            } else scanning = false
          }
          // a null left time never matches — even when same-key carry
          // state exists from earlier (non-null-time) left rows
          val matched = lT != null && carryRow != null &&
            keyOrd.compare(carryKey, lKey) == 0
          resultProj(joined(lRow, if (matched) carryRow else nullRow))
        }
      }
    }
  }
}
