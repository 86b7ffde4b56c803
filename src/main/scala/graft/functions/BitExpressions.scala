package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types._

/** Native packed bit-vector support (reference random_bitstring /
  * sift_hamming datasets, datasets.py:343, 622): binary vectors live
  * as array<long> words and hamming distance is XOR + popcount — one
  * ALU op per 64 dims instead of one comparison per dim, and 64x
  * fewer bytes scanned than a float representation.
  */

object PackBits {
  /** SQL-registration builder; bitsPerWord must be a foldable literal. */
  def fromArgs(es: Seq[Expression]): PackBits = {
    val bpw = es.lift(1).map { e =>
      require(e.foldable,
        s"pack_bits bitsPerWord must be a foldable literal, got: ${e.sql}")
      e.eval().asInstanceOf[Number].intValue()
    }.getOrElse(64)
    PackBits(es.head, bpw)
  }
}

/** Sign-binarise a float/double vector into packed words: bit j of
  * word w is (v[w*bitsPerWord + j] > 0). bitsPerWord defaults to the
  * full 64; use 60 when the packed words must also be rebuilt by a
  * DuckDB oracle (sum-of-shifted-bits construction stays BIGINT-safe
  * only below bit 63, and our oracle hash idiom caps at 60).
  */
case class PackBits(child: Expression, bitsPerWord: Int = 64)
    extends UnaryExpression with Serializable {
  require(bitsPerWord >= 1 && bitsPerWord <= 64,
    s"bitsPerWord must be in [1, 64], got $bitsPerWord")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<float|double>, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val isFloat = elemIsFloat
    val nw = (n + bitsPerWord - 1) / bitsPerWord
    val out = new Array[Long](nw)
    var i = 0
    while (i < n) {
      val x = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
      if (x > 0) out(i / bitsPerWord) |= 1L << (i % bitsPerWord)
      i += 1
    }
    new GenericArrayData(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val get = if (elemIsFloat) s"(double) $c.getFloat" else s"$c.getDouble"
      val n = ctx.freshName("n")
      val nw = ctx.freshName("nw")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      s"""
       |int $n = $c.numElements();
       |int $nw = ($n + ${bitsPerWord - 1}) / $bitsPerWord;
       |long[] $out = new long[$nw];
       |for (int $i = 0; $i < $n; $i++) {
       |  if ($get($i) > 0) $out[$i / $bitsPerWord] |= 1L << ($i % $bitsPerWord);
       |}
       |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "pack_bits"
}

/** Hamming distance between two packed bit vectors (array<long>):
  * sum_w popcount(a_w XOR b_w). The codegen'd inner loop is the
  * byte-cheap bitstring scan the reference's hamming datasets assume.
  */
case class PackedHamming(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {
  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<bigint> inputs, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
  }
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += java.lang.Long.bitCount(x.getLong(i) ^ y.getLong(i))
      i += 1
    }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      s"""
       |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
       |long $acc = 0L;
       |for (int $i = 0; $i < $n; $i++) {
       |  $acc += java.lang.Long.bitCount($a.getLong($i) ^ $b.getLong($i));
       |}
       |${ev.value} = $acc;
       """.stripMargin
    })
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
  override def prettyName: String = "packed_hamming"
}
