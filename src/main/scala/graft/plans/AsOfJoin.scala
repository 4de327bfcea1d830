package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{IntegerType, LongType, TimestampType}

/** Native as-of join — the one whole-operator semantic the built-in join
  * surface can't express efficiently.
  *
  * Semantics (pandas `merge_asof` / DuckDB `ASOF LEFT JOIN`): for every
  * left row, attach the single right row with equal keys and the greatest
  * `rightTime <= leftTime` (optionally within `tolerance` time units);
  * unmatched left rows keep nulls on the right — the reference's
  * "latest reading at or before this point" lookup
  * (/root/reference/main.py:125-150 slices the last rows by timestamp;
  * this is the join form of that access pattern).
  *
  * Why a custom plan: composing this from built-ins either window-scans a
  * union (all rows through one window per key — the j6_asof_join shape,
  * fine for one table but not reusable as a two-table join) or explodes
  * into an inequality range join (O(n·m) candidate pairs before the
  * argmax). The native operator is the textbook merge: co-partition both
  * sides by key, sort each partition by (key, time), and scan the two
  * sorted streams once — O(n+m) per partition, ONE shuffle per side, no
  * candidate blow-up. At 100 TB both sides stream; no state beyond one
  * buffered right row per partition.
  *
  * The stack below is the full Catalyst extension path (SURVEY §7.2 (c)):
  * this resolved logical node, [[AsOfJoinStrategy]] planning it, and
  * [[AsOfJoinExec]] declaring distribution/ordering requirements so
  * EnsureRequirements inserts exactly the exchanges and sorts a
  * sort-merge join would get.
  */
case class AsOfJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Attribute],
    rightKeys: Seq[Attribute],
    leftTime: Attribute,
    rightTime: Attribute,
    tolerance: Option[Long],
    direction: String) extends BinaryNode {

  require(AsOfJoin.directions.contains(direction),
    s"direction must be one of ${AsOfJoin.directions.mkString("/")}, got $direction")

  require(leftKeys.length == rightKeys.length && leftKeys.nonEmpty,
    "as-of join needs at least one equi-key per side")
  require(leftKeys.zip(rightKeys).forall { case (l, r) => l.dataType == r.dataType },
    "as-of join key types must match pairwise")
  require(leftTime.dataType == rightTime.dataType,
    "as-of join time columns must have the same type")

  /** Children must not share attribute ids, or column binding in the exec
    * would be ambiguous. NOT a constructor require: Catalyst transforms
    * re-run the constructor via `withNewChildrenInternal` on intermediate
    * trees (e.g. mid-`transformUp` states during micro-batch re-analysis),
    * where the invariant can be transiently violated and legally restored
    * by the rest of the rewrite — a constructor check turns those into
    * spurious failures (observed flaky under the full streaming suite).
    * Enforced where the plan is FINAL instead: [[AsOfJoinOps.asofJoin]]
    * right after construction, and [[AsOfJoinStrategy]] before planning
    * the exec.
    */
  def validateDisjointChildren(): Unit =
    require(left.outputSet.intersect(right.outputSet).isEmpty,
      "as-of join children must not share attributes (alias the right side)")

  // left-outer shape: every right column is nullable in the output
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

object AsOfJoin {
  val directions = Seq("backward", "forward", "nearest")
}

/** Public API for the native as-of join. */
object AsOfJoinOps {

  /** `left ASOF LEFT JOIN right ON keys AND right.time <= left.time`,
    * matching the latest right row per left row. Key/time columns are
    * named per side; the right side is re-aliased internally so self-joins
    * (both sides carved from one table) are safe. Time columns must be
    * integral or timestamp and on the same scale on both sides.
    *
    * `tolerance`: maximum allowed time distance in the time column's own
    * units (e.g. microseconds for timestamps); right rows further away
    * are treated as no-match.
    *
    * `direction` (pandas merge_asof parity):
    *  - "backward" (default): latest right row with rightTime <= leftTime;
    *  - "forward": earliest right row with rightTime >= leftTime;
    *  - "nearest": the closer of the two, ties resolving backward.
    */
  def asofJoin(left: DataFrame, right: DataFrame,
      leftOn: Seq[String], rightOn: Seq[String],
      leftTime: String, rightTime: String,
      tolerance: Option[Long] = None,
      direction: String = "backward"): DataFrame = {
    val spark = left.sparkSession
    // fresh exprIds on the right so lineage-shared inputs can't collide
    val rightFresh = right.select(right.columns.map(c => col(c).as(c)): _*)
    val lplan = Bridge.analyzed(left)
    val rplan = Bridge.analyzed(rightFresh)
    def attr(plan: LogicalPlan, name: String, side: String): Attribute =
      plan.output.find(a => spark.sessionState.conf.resolver(a.name, name))
        .getOrElse(throw new IllegalArgumentException(
          s"$side column '$name' not in [${plan.output.map(_.name).mkString(", ")}]"))
    val lt = attr(lplan, leftTime, "left time")
    val rt = attr(rplan, rightTime, "right time")
    for (t <- Seq(lt, rt))
      require(Seq(LongType, IntegerType, TimestampType).contains(t.dataType),
        s"as-of time column ${t.name} must be integral or timestamp, got ${t.dataType}")
    val node = AsOfJoin(lplan, rplan,
      leftOn.map(attr(lplan, _, "left key")), rightOn.map(attr(rplan, _, "right key")),
      lt, rt, tolerance, direction)
    node.validateDisjointChildren()
    Bridge.ofRows(spark, node)
  }
}
