package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** 64-bit SimHash from an array of element hashes in one pass:
  * counter j += (bit j of h ? +1 : -1); signature bit j = counter>0.
  * The composed-SQL version (aggregate over 64 nested aggregates)
  * walks the array 64 times; this is the fused kernel.
  */
case class SimHash64(child: Expression)
    extends UnaryExpression with Serializable {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val counters = new Array[Int](64)
    var j = 0
    val n = arr.numElements()
    while (j < n) {
      val h = arr.getLong(j)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) counters(b) += 1 else counters(b) -= 1
        b += 1
      }
      j += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) { if (counters(b) > 0) sig |= (1L << b); b += 1 }
    sig
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      // freshName on statement-level locals: unbraced inlining under a
      // non-nullable child collides fixed names across instances
      val n = ctx.freshName("n")
      val counters = ctx.freshName("counters")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val b = ctx.freshName("b")
      val b2 = ctx.freshName("b2")
      val sig = ctx.freshName("sig")
      s"""
       |int $n = $c.numElements();
       |int[] $counters = new int[64];
       |for (int $j = 0; $j < $n; $j++) {
       |  long $h = $c.getLong($j);
       |  for (int $b = 0; $b < 64; $b++) {
       |    if ((($h >>> $b) & 1L) == 1L) $counters[$b]++; else $counters[$b]--;
       |  }
       |}
       |long $sig = 0L;
       |for (int $b2 = 0; $b2 < 64; $b2++) { if ($counters[$b2] > 0) $sig |= (1L << $b2); }
       |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "simhash64"
}
