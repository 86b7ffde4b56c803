package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** All MinHash signatures in ONE pass over the element-hash array.
  * h_i(x) = (a_i * (x mod p) + b_i) mod p with p = 2^31-1 and (a,b)
  * from a fixed seed; output sigs[i] = min over the set. Composing
  * this from 64 separate `array_min(transform(...))` columns rescans
  * the array 64 times and allocates per hash — this expression is the
  * fused kernel (numHashes x n multiply-adds, zero allocation).
  */
case class MinHashSigs(child: Expression, numHashes: Int, seed: Long)
    extends UnaryExpression with Serializable {

  private val Prime = MinHashSigs.Prime

  @transient private lazy val coefs: (Array[Long], Array[Long]) =
    MinHashSigs.coefs(numHashes, seed)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val (as, bs) = coefs
    val out = Array.fill(numHashes)(Long.MaxValue)
    var j = 0
    val n = arr.numElements()
    while (j < n) {
      val x = ((arr.getLong(j) % Prime) + Prime) % Prime
      var i = 0
      while (i < numHashes) {
        val h = (as(i) * x + bs(i)) % Prime
        if (h < out(i)) out(i) = h
        i += 1
      }
      j += 1
    }
    new GenericArrayData(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val asRef = ctx.addReferenceObj("mhAs", coefs._1, "long[]")
    val bsRef = ctx.addReferenceObj("mhBs", coefs._2, "long[]")
    nullSafeCodeGen(ctx, ev, c => {
      // freshName on statement-level locals: unbraced inlining under a
      // non-nullable child collides fixed names across instances
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val j = ctx.freshName("j")
      val x = ctx.freshName("x")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      s"""
       |int $n = $c.numElements();
       |long[] $out = new long[$numHashes];
       |java.util.Arrays.fill($out, Long.MAX_VALUE);
       |for (int $j = 0; $j < $n; $j++) {
       |  long $x = (($c.getLong($j) % ${Prime}L) + ${Prime}L) % ${Prime}L;
       |  for (int $i = 0; $i < $numHashes; $i++) {
       |    long $h = ($asRef[$i] * $x + $bsRef[$i]) % ${Prime}L;
       |    if ($h < $out[$i]) $out[$i] = $h;
       |  }
       |}
       |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "minhash_sigs"
}

object MinHashSigs {
  val Prime = 2147483647L

  /** The (a_i, b_i) coefficient streams for a given (numHashes, seed).
    * Public so the DuckDB oracle SQL can embed the exact same values
    * as literals — the signatures then replicate bit-for-bit.
    */
  def coefs(numHashes: Int, seed: Long): (Array[Long], Array[Long]) = {
    val rng = new scala.util.Random(seed)
    val as = Array.fill(numHashes)(math.abs(rng.nextLong()) % Prime + 1)
    val bs = Array.fill(numHashes)(math.abs(rng.nextLong()) % Prime)
    (as, bs)
  }
}
