package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

import org.apache.spark.sql.catalyst.util.ArrayData

/** Dense matrix-vector projection y = (M·x)/scale in one fused pass —
  * the dimensionality-reduction kernel (e04/e05). The matrix is baked
  * into the expression (broadcast with the plan, like LshSigs'
  * planes); the inner j fold is ascending, identical to the
  * HOF/DuckDB formulations, so results are bit-equal to the oracle's.
  * Zero per-row allocation beyond the output array, and ~an order of
  * magnitude faster than the equivalent transform/aggregate
  * higher-order functions, which evaluate interpreted per element.
  */
case class MatProject(child: Expression, matrix: Array[Double],
    outD: Int, inD: Int, scale: Double)
    extends UnaryExpression with Serializable {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float> or array<double> input, got " +
        other.catalogString)
  }

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val fl = isFloat
    val n = math.min(inD, x.numElements())
    val out = new Array[Double](outD)
    var i = 0
    while (i < outD) {
      var acc = 0.0
      val base = i * inD
      var j = 0
      while (j < n) {
        val xv = if (fl) x.getFloat(j).toDouble else x.getDouble(j)
        acc += matrix(base + j) * xv
        j += 1
      }
      out(i) = acc / scale
      i += 1
    }
    new GenericArrayData(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mRef = ctx.addReferenceObj("projMatrix", matrix, "double[]")
    val get = if (isFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val base = ctx.freshName("base")
      val j = ctx.freshName("j")
      s"""
       |int $n = java.lang.Math.min($inD, $c.numElements());
       |double[] $out = new double[$outD];
       |for (int $i = 0; $i < $outD; $i++) {
       |  double $acc = 0.0;
       |  int $base = $i * $inD;
       |  for (int $j = 0; $j < $n; $j++) {
       |    $acc += $mRef[$base + $j] * ((double) $c.$get($j));
       |  }
       |  $out[$i] = $acc / $scale;
       |}
       |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "mat_project"
}
