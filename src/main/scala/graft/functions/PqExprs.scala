package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Native twins of the PQ distance kernels. The compositional
  * zip_with/aggregate forms in [[graft.operators.PqOps]] remain the
  * oracle-auditable spec; these produce identical doubles (same
  * left-to-right accumulation order, same strict-< tie-breaks —
  * PqOpsSpec asserts value parity) without the per-candidate array
  * allocation and interpreted-lambda evaluation that made the encode
  * and train paths the x53 profile: measured at sf0.1, the
  * compositional encode paid ~1k interpreted mini-folds PER ROW
  * (m=16 subspaces × k=64 codewords), 7.7 s for 2 000 vectors; the
  * assign side of training paid the same shape twice per iteration.
  * The [[CosineSim]] precedent, applied to squared-L2.
  */

/** Exact squared L2 in double, left-to-right — allocation-free codegen
  * twin of [[graft.operators.PqOps.dist2]]. `ImplicitCastInputTypes`
  * (advisor r15): the SQL registration (`dist2`) must coerce natural
  * calls — `array(1.0, 2.0)` parses as array<decimal>, and float/int
  * array COLUMNS would otherwise reach `getDouble` uncast, which on
  * UnsafeArrayData reinterprets raw bytes. NULL contract matches the
  * compositional spec (`dist2Spec`, zip_with + aggregate): length
  * mismatch or a null element yields NULL — the spec's NULL is how a
  * malformed vector surfaces, and the native twin must not silently
  * truncate where the spec would flag.
  */
case class Dist2(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "dist2"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var d = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val diff = x.getDouble(i) - y.getDouble(i)
      d += diff * diff
      i += 1
    }
    d
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val (n, d, i, df) = (ctx.freshName("n"), ctx.freshName("d"),
        ctx.freshName("i"), ctx.freshName("df"))
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) { ${ev.isNull} = true; }
         |else {
         |  double $d = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    double $df = $a.getDouble($i) - $b.getDouble($i);
         |    $d += $df * $df;
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $d; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Dist2 =
    copy(left = newLeft, right = newRight)
}

/** Dot product in double, left-to-right — allocation-free codegen twin
  * of [[graft.operators.SimilarityOps.dot]] (same fold order; the
  * compositional spec stays as `dotSpec` with a VectorExprsSpec parity
  * pin). x59's random projection evaluates outDim of these per row —
  * interpreted, that was outDim·dim boxed lambda steps per row.
  * Same coercion + NULL contract as [[Dist2]] (advisor r15): inputs
  * analyze to array<double>, and length mismatch / null elements yield
  * NULL exactly as the zip_with spec does.
  */
case class DotProd(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "dot_prod"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var d = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      d += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    d
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val (n, d, i) =
        (ctx.freshName("n"), ctx.freshName("d"), ctx.freshName("i"))
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) { ${ev.isNull} = true; }
         |else {
         |  double $d = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $d += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $d; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProd =
    copy(left = newLeft, right = newRight)
}

/** Matrix–vector product under a LITERAL row matrix — outDim
  * left-to-right dot folds fused into ONE pass over the input vector
  * per row ([[DotProd]]'s order per output coordinate, so values are
  * bit-identical to the chained-dot form). Exists because building the
  * projection as outDim separate dot COLUMNS re-evaluates the
  * array<double> cast of the input and a CreateArray literal per
  * coordinate per row — the x59/x82c profile. CodegenFallback: one
  * compiled JVM loop per row already.
  */
case class MatVec(child: Expression, mat: Array[Array[Double]])
    extends UnaryExpression with CodegenFallback {
  require(mat.nonEmpty, "empty matrix")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "mat_vec"

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new Array[Any](mat.length)
    var r = 0
    while (r < mat.length) {
      val row = mat(r)
      val lim = math.min(n, row.length)
      var d = 0.0
      var j = 0
      while (j < lim) { d += arr.getDouble(j) * row(j); j += 1 }
      out(r) = d
      r += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): MatVec =
    copy(child = c)
}

/** One-pass PQ encode of a vector under a LITERAL codebook (the model is
  * driver-bounded — m·k rows — so it rides in the expression, the
  * [[UnigramSegment]] discipline): per subspace, argmin over codewords
  * by exact squared-L2 with strict-< first-code-wins ties — bit-equal
  * to the compositional fold in
  * [[graft.operators.PqOps.pqEncodePackedSpec]]. CodegenFallback on
  * purpose: the per-row work is already one compiled JVM loop.
  */
case class PqEncode(child: Expression, book: Array[Array[Array[Double]]])
    extends UnaryExpression with CodegenFallback {
  require(book.nonEmpty && book.forall(_.nonEmpty), "empty codebook")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode"

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val dims = arr.numElements()
    val m = book.length
    val subLen = dims / m
    val out = new Array[Any](m)
    var s = 0
    while (s < m) {
      val cws = book(s)
      val base = s * subLen
      var bestD = Double.MaxValue
      var bestC = 0
      var c = 0
      while (c < cws.length) {
        val cw = cws(c)
        var d = 0.0
        var j = 0
        val lim = math.min(subLen, cw.length)
        while (j < lim) {
          val diff = arr.getDouble(base + j) - cw(j)
          d += diff * diff
          j += 1
        }
        if (d < bestD) { bestD = d; bestC = c }
        c += 1
      }
      out(s) = bestC
      s += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): PqEncode =
    copy(child = c)
}

object PqExprs {
  /** Inputs cast to array<double> so the codegen body's getDouble is
    * always valid — the same elementwise cast the compositional forms
    * apply, so doubles match bit for bit.
    */
  def dist2Native(a: Column, b: Column): Column =
    Bridge.column(Dist2(
      Bridge.expression(a.cast("array<double>")),
      Bridge.expression(b.cast("array<double>"))))

  def dotNative(a: Column, b: Column): Column =
    Bridge.column(DotProd(
      Bridge.expression(a.cast("array<double>")),
      Bridge.expression(b.cast("array<double>"))))

  def matVec(vec: Column, mat: Array[Array[Double]]): Column =
    Bridge.column(MatVec(Bridge.expression(vec.cast("array<double>")), mat))

  def pqEncode(vec: Column, book: Array[Array[Array[Double]]]): Column =
    Bridge.column(PqEncode(
      Bridge.expression(vec.cast("array<double>")), book))
}
