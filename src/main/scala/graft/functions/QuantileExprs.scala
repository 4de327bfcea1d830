package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, DataTypes, LongType}

/** ORDER-PRESERVING integer key of a double: a long `k(x)` with
  * `x < y ⟺ k(x) < k(y)` over all doubles (negatives, ±∞; NaN maps above
  * +∞, matching Spark's sort order; −0.0 is canonicalized to +0.0 so the
  * two zeros share a key). The classic IEEE-754 trick: the raw bit
  * pattern of a non-negative double is already monotone, and flipping the
  * magnitude bits of a negative one (keeping its sign bit) reverses that
  * half into place.
  *
  * This is what makes a FIXED-width bucket scheme work on an unbounded
  * score domain: the top `b` bits of the key are a monotone 2^b-bucket
  * histogram over ALL doubles — the quantile-sketch bucketing
  * ([[graft.operators.SketchOps.quantileSketch]]). Codegen'd (one static
  * call per row): the score path of a corpus-wide gate stays inside
  * WholeStageCodegen.
  */
case class DoubleSortKey(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def dataType: DataType = LongType
  override def prettyName: String = "double_sort_key"
  override def inputTypes: Seq[DataType] = Seq(DataTypes.DoubleType)

  override def nullSafeEval(v: Any): Any =
    DoubleSortKey.key(v.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.DoubleSortKey.key($c)")

  override protected def withNewChildInternal(c: Expression): DoubleSortKey =
    copy(c)
}

object DoubleSortKey {
  /** The monotone transform (static so generated code can call it). */
  def key(v: Double): Long = {
    val b = java.lang.Double.doubleToLongBits(if (v == 0.0) 0.0 else v)
    if (b >= 0L) b else b ^ java.lang.Long.MAX_VALUE
  }
}

object QuantileExprs {
  /** Column-API face of [[DoubleSortKey]]. */
  def doubleSortKey(score: Column): Column =
    Bridge.column(DoubleSortKey(Bridge.expression(score)))
}
