package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, BoundReference, Expression, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.SQLMetrics
import org.apache.spark.sql.types.IntegerType

/** Physical as-of join: a single forward scan over two co-partitioned,
  * co-sorted streams.
  *
  * The operator declares `ClusteredDistribution` on each side's keys and a
  * `(keys..., time)` sort per child, so EnsureRequirements plants exactly
  * one exchange per side plus the sorts — the same physical shape a
  * sort-merge join gets, which is the 100 TB contract: shuffle is
  * O(|left| + |right|) rows hashed on the join keys only, and the merge
  * itself holds ONE buffered right row per partition (no per-key group
  * materialization, no candidate pairs).
  *
  * Matching (per `direction`, pandas merge_asof parity): for each left
  * row the latest right row at or before its time ("backward"), the
  * earliest at or after it ("forward"), or the closer of the two with
  * ties resolving backward ("nearest") — always within `tolerance` if
  * set. The single forward scan serves all three: the backward candidate
  * is the last consumed same-key row, the forward candidate is the
  * stream head. SQL null semantics: a null in any key or in the time
  * column never matches.
  * Ties on (keys, time) resolve to the last row in sort order — callers
  * wanting full determinism should make (keys, time) unique on the right
  * (the oracle query aggregates to one row per key+time).
  */
case class AsOfJoinExec(
    leftKeys: Seq[Attribute],
    rightKeys: Seq[Attribute],
    leftTime: Attribute,
    rightTime: Attribute,
    tolerance: Option[Long],
    direction: String,
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTime).map(SortOrder(_, Ascending)))

  // merge preserves the left stream's order and partitioning
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  protected override def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val lOut = left.output
    val rOut = right.output
    // copy every instance field the task needs into locals: a closure that
    // touches `leftKeys`/`toLong` captures `this` and serializes the whole
    // physical subtree into every task (ADVICE r5); locals keep the task
    // payload to just the expressions
    val lKeysLocal = leftKeys
    val rKeysLocal = rightKeys
    val lTimeAttr = leftTime
    val rTimeAttr = rightTime
    val tol = tolerance
    val dir = direction
    val outAttrs = output
    val lToLong = AsOfJoinExec.longGetter(leftTime.dataType)
    val rToLong = AsOfJoinExec.longGetter(rightTime.dataType)
    // compares the projected key rows of the two sides (identical schemas)
    val keyOrdering = new LazilyGeneratedOrdering(
      leftKeys.map(_.dataType).zipWithIndex.map { case (dt, i) =>
        SortOrder(BoundReference(i, dt, nullable = true), Ascending) })
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeysLocal, lOut)
      val rKeyProj = UnsafeProjection.create(rKeysLocal, rOut)
      val lTime = BindReferences.bindReference(lTimeAttr: Expression, lOut)
      val rTime = BindReferences.bindReference(rTimeAttr: Expression, rOut)
      // right side must bind as NULLABLE (unmatched rows carry nulls)
      val resultProj = UnsafeProjection.create(outAttrs,
        lOut ++ rOut.map(_.withNullability(true)))
      val nullRight = new GenericInternalRow(rOut.size)
      val joined = new JoinedRow

      new Iterator[InternalRow] {
        private var rHead: InternalRow = _      // next unconsumed right row
        private var cand: InternalRow = _       // latest row at/before (copied)
        private var candKey: InternalRow = _
        private var candTime: Long = 0L

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val l = lIter.next()
          val lk = lKeyProj(l)
          val ltv = lTime.eval(l)
          numOutputRows += 1
          if (lk.anyNull || ltv == null) return resultProj(joined(l, nullRight))
          val lt = lToLong(ltv)
          // advance the right stream past every row at or before (lk, lt),
          // remembering the last one (the backward candidate); afterwards
          // rHead, if same-key, is the first strictly-later row (the
          // forward candidate)
          var done = false
          while (!done && (rHead != null || rIter.hasNext)) {
            if (rHead == null) rHead = rIter.next()
            val rk = rKeyProj(rHead)
            if (rk.anyNull) rHead = null // null keys never match
            else {
              val cmp = keyOrdering.compare(rk, lk)
              if (cmp < 0) rHead = null
              else if (cmp > 0) done = true
              else {
                val rtv = rTime.eval(rHead)
                if (rtv == null) rHead = null // null time never matches
                else {
                  val rt = rToLong(rtv)
                  if (rt <= lt) {
                    cand = rHead.copy(); candKey = lk.copy(); candTime = rt
                    rHead = null
                  } else done = true
                }
              }
            }
          }
          // backward candidate: distance lt - candTime (0 on equality)
          val backOk = cand != null && keyOrdering.compare(candKey, lk) == 0
          val backDist = if (backOk) lt - candTime else Long.MaxValue
          // forward candidate: an equal-time row was consumed into cand
          // (distance 0); otherwise rHead if it shares the key
          val fwdIsBack = backOk && candTime == lt
          lazy val fwdHeadOk = rHead != null && !rKeyProj(rHead).anyNull &&
            keyOrdering.compare(rKeyProj(rHead), lk) == 0
          val fwdDist: Long =
            if (fwdIsBack) 0L
            else if (fwdHeadOk) rToLong(rTime.eval(rHead)) - lt
            else Long.MaxValue
          def within(d: Long) = d != Long.MaxValue && tol.forall(d <= _)
          val matchRow: InternalRow = dir match {
            case "backward" => if (within(backDist)) cand else null
            case "forward" =>
              if (!within(fwdDist)) null else if (fwdIsBack) cand else rHead
            case _ => // nearest: closer side wins, ties resolve backward
              val b = within(backDist); val f = within(fwdDist)
              if (b && (!f || backDist <= fwdDist)) cand
              else if (f) { if (fwdIsBack) cand else rHead }
              else null
          }
          resultProj(joined(l, if (matchRow != null) matchRow else nullRight))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinExec {
  /** Time extraction resolved ONCE from the data type, returning a plain
    * serializable function — closures then carry the function, never the
    * plan node that knows the attribute.
    */
  private[plans] def longGetter(dt: org.apache.spark.sql.types.DataType): Any => Long =
    dt match {
      case IntegerType => v => v.asInstanceOf[Int].toLong
      case _           => v => v.asInstanceOf[Long] // Long, Timestamp (micros)
    }
}

/** Plans [[AsOfJoin]] logical nodes; injected via GraftExtensions.
  *
  * Physical choice mirrors the built-in join policy: a right side whose
  * size estimate fits `spark.sql.autoBroadcastJoinThreshold` plans as
  * [[BroadcastAsOfJoinExec]] (no shuffle, no sort — the fact side streams);
  * anything else gets the co-partitioned merge [[AsOfJoinExec]]. Set
  * `spark.graft.asof.broadcast=false` to force the merge path.
  */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case j @ AsOfJoin(l, r, lk, rk, lt, rt, tol, dir) =>
      // the point where the logical plan is final — transient
      // mid-transform states are behind us, so the ambiguity check is
      // meaningful here (and deliberately NOT in the node's constructor)
      j.validateDisjointChildren()
      val conf = org.apache.spark.sql.internal.SQLConf.get
      val thresh = conf.autoBroadcastJoinThreshold
      val enabled =
        conf.getConfString("spark.graft.asof.broadcast", "true").toBoolean
      if (enabled && thresh > 0 && r.stats.sizeInBytes <= thresh)
        BroadcastAsOfJoinExec(lk, rk, lt, rt, tol, dir,
          planLater(l), planLater(r)) :: Nil
      else
        AsOfJoinExec(lk, rk, lt, rt, tol, dir,
          planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}
