package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.physical.Partitioning
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.execution.metric.SQLMetrics

/** Broadcast as-of join: the right side is collected, grouped by key, and
  * time-sorted ON THE DRIVER, broadcast once, and the left side streams
  * through a per-row binary search — NO shuffle, NO sort, no exchange at
  * all (asserted in the spec).
  *
  * This is the as-of analogue of BroadcastHashJoin, and at 100 TB it is
  * the shape that matters whenever the right side is dimension-like
  * (rate tables, calibration snapshots, config-over-time): the
  * alternative co-partition plan shuffles and sorts the ENTIRE fact side
  * on the join key just to merge it against kilobytes of reference data.
  * Left partitioning and ordering pass through untouched, so downstream
  * operators keep whatever distribution the scan gave them.
  *
  * Chosen by [[AsOfJoinStrategy]] when the right plan's size estimate is
  * under `spark.sql.autoBroadcastJoinThreshold` (same policy knob as the
  * built-in joins); the merge exec remains the general path.
  */
case class BroadcastAsOfJoinExec(
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
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"),
    "broadcastKeys" -> SQLMetrics.createMetric(sparkContext, "broadcast distinct keys"))

  // left side flows through untouched — that is the whole point
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  protected override def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val broadcastKeys = longMetric("broadcastKeys")
    val rOut = right.output
    val rToLong = AsOfJoinExec.longGetter(rightTime.dataType)
    // driver-side build: key row -> time-sorted (time, row) pairs.
    // The strategy chose this path from LOGICAL size stats, which can
    // underestimate badly after filters — cap what the driver will actually
    // materialize (BroadcastExchange has the same guard) instead of OOMing.
    val maxRows = org.apache.spark.sql.internal.SQLConf.get
      .getConfString("spark.graft.asof.broadcast.maxRows", "10000000").toLong
    val collected = right.executeCollect()
    if (collected.length > maxRows) {
      throw new IllegalStateException(
        s"as-of broadcast side has ${collected.length} rows, over the " +
          s"spark.graft.asof.broadcast.maxRows cap ($maxRows); set " +
          "spark.graft.asof.broadcast=false to force the shuffled merge path")
    }
    val rKeyProj = UnsafeProjection.create(rightKeys, rOut)
    val rTimeBound = BindReferences.bindReference(rightTime: Expression, rOut)
    val index = scala.collection.mutable.HashMap
      .empty[UnsafeRow, scala.collection.mutable.ArrayBuffer[(Long, InternalRow)]]
    collected.foreach { row =>
      val k = rKeyProj(row)
      val tv = rTimeBound.eval(row)
      if (!k.anyNull && tv != null) { // null keys/times never match
        index.getOrElseUpdate(k.copy(),
          scala.collection.mutable.ArrayBuffer.empty) +=
          ((rToLong(tv), row.copy()))
      }
    }
    broadcastKeys += index.size
    // stable sort keeps insertion order on time ties (same caveat as the
    // merge exec: make (key, time) unique on the right for determinism)
    val bc = sparkContext.broadcast(index.iterator.map { case (k, buf) =>
      val sorted = buf.sortBy(_._1)
      (k, (sorted.map(_._1).toArray, sorted.map(_._2).toArray))
    }.toMap)

    val lOut = left.output
    val dir = direction
    val tol = tolerance
    val lKeysLocal = leftKeys
    val lTimeAttr = leftTime
    val lToLong = AsOfJoinExec.longGetter(leftTime.dataType)
    left.execute().mapPartitions({ lIter =>
      val lookup = bc.value
      val lKeyProj = UnsafeProjection.create(lKeysLocal, lOut)
      val lTime = BindReferences.bindReference(lTimeAttr: Expression, lOut)
      val resultProj = UnsafeProjection.create(output,
        lOut ++ rOut.map(_.withNullability(true)))
      val nullRight = new GenericInternalRow(rOut.size)
      val joined = new JoinedRow

      lIter.map { l =>
        numOutputRows += 1
        val lk = lKeyProj(l)
        val ltv = lTime.eval(l)
        val matched: InternalRow =
          if (lk.anyNull || ltv == null) null
          else lookup.get(lk) match {
            case None => null
            case Some((times, rows)) =>
              val lt = lToLong(ltv)
              // last index with time <= lt (-1 if none)
              var lo = 0; var hi = times.length - 1; var back = -1
              while (lo <= hi) {
                val mid = (lo + hi) >>> 1
                if (times(mid) <= lt) { back = mid; lo = mid + 1 } else hi = mid - 1
              }
              val fwd = back + 1 // first index with time > lt (or == via back)
              def within(d: Long) = tol.forall(d <= _)
              dir match {
                case "backward" =>
                  if (back >= 0 && within(lt - times(back))) rows(back) else null
                case "forward" =>
                  if (back >= 0 && times(back) == lt) rows(back)
                  else if (fwd < times.length && within(times(fwd) - lt)) rows(fwd)
                  else null
                case _ => // nearest, ties backward
                  val bOk = back >= 0 && within(lt - times(back))
                  val fOk = fwd < times.length && within(times(fwd) - lt)
                  if (bOk && (!fOk || lt - times(back) <= times(fwd) - lt)) rows(back)
                  else if (fOk) rows(fwd)
                  else null
              }
          }
        resultProj(joined(l, if (matched != null) matched else nullRight))
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): BroadcastAsOfJoinExec =
    copy(left = newLeft, right = newRight)
}
