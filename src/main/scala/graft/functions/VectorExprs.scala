package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Fused cosine similarity over two `array<float>` columns as a native
  * Catalyst expression with whole-stage codegen: one loop accumulates
  * dot, ‖a‖² and ‖b‖² (sequential left-to-right double adds — bitwise
  * identical to the compositional zip_with/aggregate form in
  * [[graft.operators.SimilarityOps.cosine]] and to the DuckDB oracle's
  * list_reduce), then returns dot / (√‖a‖² · √‖b‖²).
  *
  * Exists because the compositional form allocates a zipped intermediate
  * array per row pair — on an all-pairs similarity join that allocation is
  * the bottleneck (~25× slower at sf0.1), not the arithmetic. The codegen
  * body is allocation-free.
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xv = x.getFloat(i).toDouble
      val yv = y.getFloat(i).toDouble
      dot += xv * yv; na += xv * xv; nb += yv * yv
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val (n, dot, na, nb, i) =
        (ctx.freshName("n"), ctx.freshName("dot"), ctx.freshName("na"),
          ctx.freshName("nb"), ctx.freshName("i"))
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double x = (double) $a.getFloat($i);
         |  double y = (double) $b.getFloat($i);
         |  $dot += x * y; $na += x * x; $nb += y * y;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

object VectorExprs {
  /** Column-API entry point for the fused cosine. Inputs are cast to
    * array<float> so the codegen body's getFloat access is always valid.
    */
  def cosineSim(a: Column, b: Column): Column =
    Bridge.column(CosineSim(
      Bridge.expression(a.cast("array<float>")),
      Bridge.expression(b.cast("array<float>"))))
}
