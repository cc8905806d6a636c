package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expressions for the float-vector hot path — SURVEY.md
  * §4.2 ("custom Expression only if profiling shows UDF hotspots").
  *
  * The higher-order-function formulation (`aggregate(zip_with(a, b, *))`)
  * is semantically identical but interpreted: per element it allocates
  * lambda variables and boxes doubles. These expressions generate a tight
  * primitive loop via doGenCode, keeping ANN rerank inside whole-stage
  * codegen. Accumulation is the SAME strict left fold in double, so
  * results are bit-identical with the HOF version (and the DuckDB
  * oracle).
  */

/** dot(a, b) over two array<float> columns, accumulated in double.
  * Matches the HOF (`zip_with`) formulation exactly, including its null
  * semantics: NULL when the lengths differ or any element is null. */
case class DotF32(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = VectorExprCheck.floatArrays(left, right)
  override def dataType: DataType = DoubleType
  // can produce null from non-null inputs (ragged / null-element arrays)
  override def nullable: Boolean = true
  override def prettyName: String = "vec_dot_f32"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** cosine(a, b) over two array<float> columns in ONE pass (three
  * accumulators); 0.0 when either norm is zero. Each accumulator folds in
  * the same order as the separate-fold formulation, so values match
  * [[graft.functions.Vectors.cosine]] bit-for-bit — including its null
  * semantics: NULL when the lengths differ or any element is null. */
case class CosineF32(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = VectorExprCheck.floatArrays(left, right)
  override def dataType: DataType = DoubleType
  // can produce null from non-null inputs (ragged / null-element arrays)
  override def nullable: Boolean = true
  override def prettyName: String = "vec_cosine_f32"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var d = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = x.getFloat(i).toDouble
      val yv = y.getFloat(i).toDouble
      d += xv * yv; na += xv * xv; nb += yv * yv
      i += 1
    }
    val nna = math.sqrt(na); val nnb = math.sqrt(nb)
    if (nna == 0.0 || nnb == 0.0) 0.0 else d / (nna * nnb)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val d = ctx.freshName("d"); val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
      val nna = ctx.freshName("nna"); val nnb = ctx.freshName("nnb")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $d = 0.0; double $na = 0.0; double $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    double $xv = (double) $a.getFloat($i);
         |    double $yv = (double) $b.getFloat($i);
         |    $d += $xv * $yv; $na += $xv * $xv; $nb += $yv * $yv;
         |  }
         |  if (!${ev.isNull}) {
         |    double $nna = java.lang.Math.sqrt($na);
         |    double $nnb = java.lang.Math.sqrt($nb);
         |    ${ev.value} = ($nna == 0.0 || $nnb == 0.0) ? 0.0 : $d / ($nna * $nnb);
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Shared input validation (ExpectsInputTypes needs private[sql] types). */
object VectorExprCheck {
  def floatArrays(left: Expression, right: Expression): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"expected (array<float>, array<float>), got (${left.dataType.sql}, ${right.dataType.sql})")
  }
}
