package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, AttributeReference, AttributeSet, Expression,
  GenericInternalRow, JoinedRow, NamedExpression, RowOrdering, SortOrder,
  UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{
  ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Whole-operator as-of join as a first-class Catalyst plan — the design
  * brief's custom-operator tier (c): a logical node, a planner strategy,
  * and a physical operator registered via SparkSessionExtensions /
  * experimental.extraStrategies.
  *
  * Semantics match graft.operators.TemporalJoins.asofJoin (the composed
  * union+window form, reference FinInsight has no joins at all — this is
  * engine extension surface): for every left row, attach the LATEST right
  * payload with right.ts <= left.ts within the same key; left rows with no
  * prior right row carry nulls. Right rows are expected unique per
  * (keys, ts) — callers dedup (the API wrapper does).
  *
  * Why a physical operator when the union+window form already works: the
  * window form unions both sides into ONE sorted stream — every right row
  * is carried through the window sort alongside the left rows, the window
  * buffers `last(ignoreNulls)` state per row, and the filter then throws
  * the right rows away. The merge exec shuffles/sorts each side separately
  * (same single-shuffle bound) and streams a two-pointer merge per
  * partition: no union blow-up, no window buffer, no post-filter, O(1)
  * state per key. Distribution/ordering requirements are declared, so
  * EnsureRequirements co-partitions and co-sorts the children exactly like
  * a sort-merge join — and reuses existing partitioning/ordering when a
  * side is already bucketed or sorted (the window form can never skip its
  * sort, because the union destroys per-side properties).
  */
final case class AsOfJoinNode(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTs: Expression,
    rightTs: Expression,
    rightPayload: Seq[NamedExpression],
    asofAttrs: Seq[Attribute]) extends BinaryNode {

  require(leftKeys.length == rightKeys.length, "key arity mismatch")
  require(rightPayload.length == asofAttrs.length, "payload/output arity mismatch")
  // the exec compares right-projected UnsafeRows with orderings built from
  // the LEFT side's types — a type mismatch would silently reinterpret raw
  // bits instead of failing analysis, so reject it here
  require(leftKeys.map(_.dataType) == rightKeys.map(_.dataType),
    s"key type mismatch: ${leftKeys.map(_.dataType)} vs ${rightKeys.map(_.dataType)}")
  require(leftTs.dataType == rightTs.dataType,
    s"timestamp type mismatch: ${leftTs.dataType} vs ${rightTs.dataType}")

  override def output: Seq[Attribute] = left.output ++ asofAttrs

  // asofAttrs are minted by this operator, not read from a child —
  // without declaring them produced, CheckAnalysis reports them missing
  override def producedAttributes: AttributeSet = AttributeSet(asofAttrs)

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinNode {
  /** Output attributes for a payload: `asof_<name>`, nullable (no-match
    * left rows carry nulls).
    */
  def outputAttrs(payload: Seq[NamedExpression]): Seq[Attribute] =
    payload.map(p => AttributeReference(s"asof_${p.name}", p.dataType, nullable = true)())
}

/** Optimizer rule: push key-only filter predicates THROUGH the as-of join
  * into BOTH children. Catalyst's PushDownPredicates cannot see through an
  * unknown node, so `asof.filter($"user_id" < 5)` would otherwise join the
  * full corpus and discard 97% of it afterwards — at 100 TB the difference
  * between a pruned scan and a full one. Pushing a key predicate is
  * semantics-preserving on both sides: left rows are filtered exactly as
  * the post-filter would, and a right row whose key fails the predicate
  * can only have matched left rows that are themselves filtered out.
  * Non-key predicates (on left payload or asof_* outputs) stay above the
  * join. Registered alongside the strategy (injectOptimizerRule /
  * experimental.extraOptimizations).
  */
object PushFilterThroughAsOfJoin
    extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan]
    with org.apache.spark.sql.catalyst.expressions.PredicateHelper {
  import org.apache.spark.sql.catalyst.expressions.And
  import org.apache.spark.sql.catalyst.plans.logical.Filter

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, j: AsOfJoinNode) =>
      // only bare-attribute key pairs are rewritable to the right side;
      // the DataFrame builder always produces that shape
      val keyPairs = j.leftKeys.zip(j.rightKeys).collect {
        case (la: Attribute, ra: Attribute) => la -> ra
      }
      if (keyPairs.length != j.leftKeys.length) f
      else {
        val leftKeySet = AttributeSet(keyPairs.map(_._1))
        val (pushable, rest) = splitConjunctivePredicates(cond)
          .partition(p => p.deterministic && p.references.subsetOf(leftKeySet))
        if (pushable.isEmpty) f
        else {
          val l2r = keyPairs.map { case (la, ra) => la.exprId -> ra }.toMap
          val rightPred = pushable.map(_.transform {
            case a: Attribute if l2r.contains(a.exprId) => l2r(a.exprId)
          })
          val pushed = j.copy(
            left = Filter(pushable.reduce(And), j.left),
            right = Filter(rightPred.reduce(And), j.right))
          rest.reduceOption(And).map(Filter(_, pushed)).getOrElse(pushed)
        }
      }
  }
}

/** Plans the logical node into the merge exec; everything else falls
  * through to Spark's built-in strategies.
  */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lk, rk, lts, rts, payload, attrs) =>
      AsOfJoinExec(lk, rk, lts, rts, payload, attrs, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** Sort-merge as-of join: children are hash-clustered on the keys and
  * sorted by (keys, ts) — declared, so EnsureRequirements inserts (or
  * elides, when a child already satisfies them) the exchanges and sorts —
  * then each partition streams a two-pointer merge holding exactly one
  * candidate payload per in-flight key.
  *
  * Key equality is null-safe (null keys group and match each other),
  * matching the union+window form, whose PARTITION BY groups null keys
  * too. Ties on ts are inclusive: a right row AT the left timestamp is
  * attached (DuckDB/pandas ASOF `>=` semantics).
  */
final case class AsOfJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTs: Expression,
    rightTs: Expression,
    rightPayload: Seq[Expression],
    asofAttrs: Seq[Attribute],
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ asofAttrs

  override def producedAttributes: AttributeSet = AttributeSet(asofAttrs)

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTs).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTs).map(SortOrder(_, Ascending)))

  // the merge preserves the left side's row order and partitioning — a
  // downstream per-key window or join on the same keys skips its exchange
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    (leftKeys :+ leftTs).map(SortOrder(_, Ascending))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val keyTypes = leftKeys.map(_.dataType)
    val tsType = leftTs.dataType
    val leftOut = left.output
    val rightOut = right.output
    val lk = leftKeys; val rk = rightKeys
    val lts = leftTs; val rts = rightTs
    val payload = rightPayload
    val arity = asofAttrs.length
    val outTypes = asofAttrs.map(_.dataType)
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      if (!lIter.hasNext) Iterator.empty
      else new Iterator[InternalRow] {
        private val lKeyProj = UnsafeProjection.create(lk, leftOut)
        private val rKeyProj = UnsafeProjection.create(rk, rightOut)
        private val lTsProj = UnsafeProjection.create(Seq(lts), leftOut)
        private val rTsProj = UnsafeProjection.create(Seq(rts), rightOut)
        private val payloadProj = UnsafeProjection.create(payload, rightOut)
        private val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
        private val tsOrd = RowOrdering.createNaturalAscendingOrdering(Seq(tsType))
        private val nullRow = new GenericInternalRow(arity)
        private val joined = new JoinedRow
        // downstream operators (shuffles in particular) require UnsafeRow;
        // flatten the JoinedRow through a positional projection
        private val outProj = UnsafeProjection.create(
          (leftOut.map(_.dataType) ++ outTypes).toArray)
        private var rHead: InternalRow = if (rIter.hasNext) rIter.next() else null
        // the single in-flight candidate: latest right payload whose key
        // still equals lastKey — O(1) state regardless of key cardinality
        private var lastKey: UnsafeRow = _
        private var lastPayload: UnsafeRow = _

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val lrow = lIter.next()
          val lkey = lKeyProj(lrow)
          val ltsRow = lTsProj(lrow)
          var scanning = rHead != null
          while (scanning) {
            val rkey = rKeyProj(rHead)
            val c = keyOrd.compare(rkey, lkey)
            if (c < 0) {
              // right key already passed by the ascending left keys —
              // cannot match this or any later left row; discard
              rHead = if (rIter.hasNext) rIter.next() else null
            } else if (c == 0 && tsOrd.compare(rTsProj(rHead), ltsRow) <= 0) {
              // candidate at-or-before the left timestamp: remember, advance
              if (lastKey == null || keyOrd.compare(lastKey, rkey) != 0)
                lastKey = rkey.copy()
              lastPayload = payloadProj(rHead).copy()
              rHead = if (rIter.hasNext) rIter.next() else null
            } else scanning = false
            if (rHead == null) scanning = false
          }
          val m =
            if (lastKey != null && keyOrd.compare(lastKey, lkey) == 0) lastPayload
            else nullRow
          outProj(joined(lrow, m))
        }
      }
    }
  }
}
