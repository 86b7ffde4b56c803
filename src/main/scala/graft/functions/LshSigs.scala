package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** All random-hyperplane LSH table signatures in one pass: for table
  * t, bit b = [dot(vec, plane_{t,b}) > 0]. planes is (tables x bits x
  * dim), baked into the expression (broadcast with the plan). One
  * traversal computes tables x bits dot products with zero per-row
  * allocation beyond the output array.
  */
case class LshSigs(child: Expression, planes: Array[Array[Array[Double]]])
    extends UnaryExpression with Serializable {

  @transient private lazy val flat: Array[Double] = planes.flatMap(_.flatten)
  private val nTables = planes.length
  private val nBits = if (planes.isEmpty) 0 else planes(0).length
  private val dim = if (nBits == 0) 0 else planes(0)(0).length

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val fl = isFloat
    val n = math.min(arr.numElements(), dim)
    val out = new Array[Long](nTables)
    var t = 0
    while (t < nTables) {
      var sig = 0L
      var b = 0
      while (b < nBits) {
        val off = (t * nBits + b) * dim
        var d = 0.0
        var i = 0
        while (i < n) {
          val x = if (fl) arr.getFloat(i).toDouble else arr.getDouble(i)
          d += x * flat(off + i)
          i += 1
        }
        if (d > 0) sig |= (1L << b)
        b += 1
      }
      out(t) = sig
      t += 1
    }
    new GenericArrayData(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val flatRef = ctx.addReferenceObj("lshPlanes", flat, "double[]")
    val get = if (isFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, c => {
      // freshName on statement-level locals: unbraced inlining under a
      // non-nullable child collides fixed names across instances
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val t = ctx.freshName("t")
      val sig = ctx.freshName("sig")
      val b = ctx.freshName("b")
      val off = ctx.freshName("off")
      val d = ctx.freshName("d")
      val i = ctx.freshName("i")
      s"""
       |int $n = java.lang.Math.min($c.numElements(), $dim);
       |long[] $out = new long[$nTables];
       |for (int $t = 0; $t < $nTables; $t++) {
       |  long $sig = 0L;
       |  for (int $b = 0; $b < $nBits; $b++) {
       |    int $off = ($t * $nBits + $b) * $dim;
       |    double $d = 0.0;
       |    for (int $i = 0; $i < $n; $i++) {
       |      $d += ((double) $c.$get($i)) * $flatRef[$off + $i];
       |    }
       |    if ($d > 0) $sig |= (1L << $b);
       |  }
       |  $out[$t] = $sig;
       |}
       |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "lsh_sigs"
}
